"""anyv2v_tpu — a TPU-native (JAX/XLA/Pallas) training-free video-to-video editing
framework with the capabilities of TIGER-AI-Lab/AnyV2V.

Architecture (TPU-first, not a port):

- One jit-compiled, ``lax.scan``-based denoising driver shared by all backbones
  (the reference has three near-clone pipelines; see ``/root/reference``'s
  ``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py``,
  ``consisti2v/.../pipeline_video_editing.py``, ``seine/run_pnp_edit.py``).
- Plug-and-play feature injection is *data*, not Python forward hooks: boolean
  per-step schedules flow into the UNet, which swaps Q/K batch rows
  (source -> uncond, source -> cond) with ``jnp.where`` — replacing the
  monkey-patching in the reference's ``pnp_utils.py``.
- The DDIM latent trajectory is an array in HBM produced by a jitted inversion
  scan, replacing the per-step ``torch.save``/``torch.load`` filesystem bus
  (reference ``pipeline_i2vgen_xl.py:1424-1428`` / ``:1134``).
- Frames and CFG branches shard over a ``jax.sharding.Mesh``; collectives ride
  ICI via XLA (the reference is single-GPU only).

Layout convention: video tensors are channels-last ``[B, F, H, W, C]``
(TPU/XLA-native); spatial layers fold frames into batch ``[(B F), H, W, C]``,
temporal layers fold space into batch ``[(B H W), F, C]``.
"""

__version__ = "0.1.0"

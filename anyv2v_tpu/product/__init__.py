"""Product layer (reference §2.5): in-process AnyV2V runner, Replicate-style
predictor, gradio app builders."""

from .anyv2v import AnyV2VRunner, perform_anyv2v

__all__ = ["AnyV2VRunner", "perform_anyv2v"]

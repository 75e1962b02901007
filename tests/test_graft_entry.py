"""Driver-entry budget gate: the multichip dryrun must finish COLD (empty
compilation cache) within the driver's time budget on this 1-core host
(VERDICT r2 item 2 — `MULTICHIP_r02.json` was rc=124 because the dryrun
outgrew its budget; the driver runs it cold on a machine whose XLA:CPU AOT
cache entries never match this host's).

Runs in a subprocess because dryrun_multichip self-provisions an 8-device
virtual CPU platform, which must happen before jax backend initialization.
"""

import os
import subprocess
import sys
import tempfile
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Wall-clock budget: overridable so a loaded/slower host is distinguishable
# from a real compile-time regression (ADVICE r3) — CI keeps the default.
BUDGET_S = int(os.environ.get("ANYV2V_DRYRUN_BUDGET_S", "360"))


@pytest.mark.slow
def test_dryrun_multichip_cold_within_budget():
    with tempfile.TemporaryDirectory() as cache_dir:
        env = dict(
            os.environ,
            ANYV2V_COMPILE_CACHE=cache_dir,   # cold: fresh empty cache
            JAX_PLATFORMS="",                  # let the dryrun self-provision
        )
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=BUDGET_S + 60,
        )
        wall = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout
    assert wall < BUDGET_S, (
        f"cold dryrun took {wall:.0f}s (> {BUDGET_S}s budget); marks:\n"
        + "\n".join(l for l in r.stderr.splitlines() if "[dryrun" in l)
    )

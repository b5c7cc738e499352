"""TPU-gated Pallas lowering test (runs only when a real TPU is attached).

Round 1 shipped a Pallas extend-add kernel that passed all interpret-mode
tests but failed Mosaic lowering on hardware (VERDICT.md weak #1/#2): the
interpret path skips exactly the block-mapping checks that killed the
bench.  This test lowers — and compiles — the WHOLE factorization program
for the real backend at the 32^3 plan's actual bucket shapes, in a
subprocess with the launch platform restored (this suite pins jax to CPU).
"""
import os
import subprocess
import sys

import pytest

_ORIG = os.environ.get("STRUMPACK_TPU_ORIG_PLATFORM", "")


def _tpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = _ORIG
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.skipif(_ORIG in ("", "cpu"),
                    reason="no TPU platform at suite launch")
def test_factorization_lowers_and_compiles_on_tpu():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tpu_lowering_worker.py")
    r = subprocess.run([sys.executable, worker], env=_tpu_env(),
                       capture_output=True, text=True, timeout=3000)
    if r.returncode == 42:
        pytest.skip("worker found no TPU device")
    assert r.returncode == 0, (
        f"TPU lowering failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}")
    assert "lowered OK" in r.stdout
    assert "split OK" in r.stdout      # split-program family on chip
    assert "mesh OK" in r.stdout       # shard_map family on chip

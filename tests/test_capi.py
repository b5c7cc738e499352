"""C API build-and-run test.

Role of the reference's test/build_external external-consumer build test +
the C interface exercising examples (dstructured.c style): compile
libstrumpack_tpu_c.so and the csparse example with the system compiler,
run the binary against this repo's package, check the numerical result via
the process exit code (0 = max|x-1| < 1e-8).
"""
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("gcc") is None or
                    shutil.which("make") is None,
                    reason="no C toolchain")
def test_capi_external_consumer():
    capi = os.path.join(REPO, "capi")
    subprocess.run(["make", "-C", capi], check=True, capture_output=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # embedded interpreter must see the package and (if present) the site
    # dir carrying the TPU plugin registration
    paths = [REPO] + [p for p in sys.path if p.endswith(".axon_site")]
    axon = "/root/.axon_site"
    if os.path.isdir(axon) and axon not in paths:
        paths.append(axon)
    env["PYTHONPATH"] = ":".join(paths)
    r = subprocess.run([os.path.join(capi, "csparse"), "20"],
                       env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "max|x-1|" in r.stdout


@pytest.mark.skipif(shutil.which("gcc") is None or
                    shutil.which("make") is None,
                    reason="no C toolchain")
def test_capi_option_flags_forwarded():
    """--sp_* argv forwarded through STRUMPACK_init_mt reaches the parser."""
    capi = os.path.join(REPO, "capi")
    subprocess.run(["make", "-C", capi], check=True, capture_output=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    paths = [REPO]
    axon = "/root/.axon_site"
    if os.path.isdir(axon):
        paths.append(axon)
    env["PYTHONPATH"] = ":".join(paths)
    r = subprocess.run(
        [os.path.join(capi, "csparse"), "20", "--sp_gmres_restart", "17"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)


@pytest.mark.skipif(shutil.which("gcc") is None or
                    shutil.which("make") is None,
                    reason="no C toolchain")
def test_capi_structured_and_kernel():
    """StructuredMatrix + Kernel C interfaces (reference
    structured/StructuredMatrix.h + kernel/Kernel.h roles, exercised the
    way examples/dense/dstructured.c does)."""
    capi = os.path.join(REPO, "capi")
    subprocess.run(["make", "-C", capi], check=True, capture_output=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    paths = [REPO] + [p for p in sys.path if p.endswith(".axon_site")]
    axon = "/root/.axon_site"
    if os.path.isdir(axon) and axon not in paths:
        paths.append(axon)
    env["PYTHONPATH"] = ":".join(paths)
    r = subprocess.run([os.path.join(capi, "cstructured"), "160"],
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "OK" in r.stdout

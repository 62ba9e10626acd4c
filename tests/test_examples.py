"""Smoke-run the examples so they can't rot (VERDICT r2 next #9).

Each example is executed as a real subprocess (its own backend config,
exactly as a user would run it) on the virtual 8-device CPU mesh.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # heavyweight tier (make test-fast deselects)

ROOT = Path(__file__).resolve().parents[1]

def _cache_env(env):
    """Subprocesses share the suite's persistent compile cache (they
    can't inherit in-process jax.config, but JAX reads these env vars)."""
    cache = os.environ.get("TQ_TEST_CACHE_DIR", "/tmp/tq_test_jax_cache")
    if cache != "0":
        env["JAX_COMPILATION_CACHE_DIR"] = cache
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return env


EXAMPLES = [
    ("quantize_resnet18.py", ["--wt", "12", "--image", "64", "--batch", "4"],
     "serving-mode top-1 agrees"),
    ("sharded_inference.py", [], "served 100 requests"),
    ("pipeline_inference.py", [], "pipelined 8 microbatches"),
    ("lm_serving.py", [], "served 51 generation requests"),
]


@pytest.mark.parametrize("script,args,expect", EXAMPLES,
                         ids=[e[0] for e in EXAMPLES])
def test_example_runs(script, args, expect):
    env = _cache_env(dict(os.environ))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout, proc.stdout[-2000:]


def test_readme_generate_command(tmp_path):
    """The committed demo checkpoint makes the README's generate command
    work from a fresh checkout (VERDICT r3 next #6)."""
    env = _cache_env(dict(os.environ))
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "generated.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "tq_tpu.evals.generate",
         "--checkpoint", "pretrained/lstm.npz", "--words", "25",
         "--outf", str(out)],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "wrote 25 words" in proc.stdout
    assert len(out.read_text().split()) == 25

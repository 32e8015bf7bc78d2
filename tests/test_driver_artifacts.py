"""Tripwires for the two driver-facing artifacts.

The driver runs ``bench.py`` (one JSON line on stdout) and
``__graft_entry__`` (single-chip compile check + virtual-mesh dryrun)
OUTSIDE the test suite, so nothing here gated them — and the bench
presets silently rotted once when the solve-fn tuple grew
(trunc counters; fixed in ffba928). Run them for real, in subprocesses
(both must control the JAX platform before import).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_bench_smoke_preset_emits_json():
    r = _run(
        "import os, sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "sys.argv = ['bench.py', '--preset', 'smoke']\n"
        "exec(open('bench.py').read())\n"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "dcr_survey_walker_steps_per_sec_per_chip"
    assert rec["value"] > 0 and "vs_baseline" in rec and "unit" in rec


def test_graft_entry_runs_single_chip():
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = fn(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('ENTRY_OK', len(out))\n"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ENTRY_OK" in r.stdout, r.stdout

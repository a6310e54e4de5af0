"""bench.py must never crash: run its CPU smoke mode end-to-end."""

import json
import subprocess
import sys


def test_bench_cpu_smoke():
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=1200,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        },
        cwd=__import__("os").path.dirname(__import__("os").path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    # run-mode qualifiers: a materialized-input CPU smoke run must label
    # its timing mode and must NOT be marked as on-device synthesis
    assert rec["timing"] in ("pipelined", "serialized")
    assert rec["lines"] > 0
    assert "synth" not in rec

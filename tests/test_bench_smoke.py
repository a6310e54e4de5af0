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


def test_bench_staged_sectioned_cpu_smoke():
    """The multi-GB default route (per-scene estimation + sectioned
    transform, depth-pipelined) must run end-to-end and label its mode;
    forcing the staged threshold below the smoke line count engages it
    on CPU."""
    import os

    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=1200,
        env={
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "OIP_BENCH_LINES": "2048",
            "OIP_BENCH_STAGED_THRESHOLD": "1024",
            "OIP_BENCH_SECTION_ROWS": "1024",
        },
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] > 0
    assert rec["timing"] == "pipelined-sectioned"
    assert rec["sections"] == 2
    assert "register" in out.stderr  # per-scene estimation really ran


def test_bench_stream_mode_cpu_smoke():
    """OIP_BENCH_MODE=stream: the streamed-sections bench (the scenes->HBM
    design artifact) must run end-to-end and label its run mode."""
    import os

    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=1200,
        env={
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "OIP_BENCH_MODE": "stream",
            "OIP_BENCH_LINES": "1024",
        },
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] > 0
    assert rec["timing"] == "streamed-sections"
    assert rec["sections"] >= 1

"""Worker for the 2-process multi-host SCENE e2e test (not a test module).

Each process joins the distributed mesh via the OIP_DIST_* env contract,
then runs the FULL flagship ``run_scene`` flow — per-host shard ingest,
the fused SPMD scene step (RRC + registration + stt + resamples + seam
concat), the CMOS2 MSS align, and every multi-host output drain: the
ALIGNED TIFFs and the stitched-MSS TIFF through
``drain_line_sharded_to_tiff`` and the stitched PAN RAW through
``drain_line_sharded_to_raw`` (each process row-offset-writes only its
own shards into the shared files).

Usage: dist_scene_worker.py <procid> <nprocs> <port> <datadir>
"""

import os
import sys


def main() -> None:
    procid, nprocs, port, datadir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["OIP_DIST_COORD"] = f"127.0.0.1:{port}"
    os.environ["OIP_DIST_NPROCS"] = str(nprocs)
    os.environ["OIP_DIST_PROCID"] = str(procid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from opticalimageprocessor_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed()

    from opticalimageprocessor_tpu.models.scene import run_scene

    outs = run_scene(
        os.path.join(datadir, "C1.PAN.RAW"),
        os.path.join(datadir, "C2.PAN.RAW"),
        os.path.join(datadir, "C1.MSS.RAW"),
        rrc_pan1=os.path.join(datadir, "pan.rrc"),
        rrc_pan2=os.path.join(datadir, "pan.rrc"),
        mss2_file=os.path.join(datadir, "C2.MSS.RAW"),
        slices=8,
        fold_cols=32,
        stt_sections=2,
        pixels_per_line=640,
        out_dir=os.path.join(datadir, "out_multi"),
        out_stitched=os.path.join(datadir, "out_multi", "stitched.RAW"),
        mesh=8,
    )
    print(f"scene worker {procid} done: {sorted(outs)}", flush=True)


if __name__ == "__main__":
    main()

"""Worker for the 2-process multi-host ALIGN-E2E test (not a test module).

Each process joins the distributed mesh via the OIP_DIST_* env contract
(the same path the CLI front door uses), then runs the FULL
run_sharded_align flow — file ingest, SPMD step, and the multi-host
TIFF drains (per-process row-offset writes into one shared file).

Usage: dist_align_worker.py <procid> <nprocs> <port> <datadir>
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

    from opticalimageprocessor_tpu.models.sharded_align import (
        run_sharded_align,
    )

    kwargs = dict(
        rrc_pan_file=os.path.join(datadir, "pan.rrc"),
        rrc_mss_files=tuple(
            os.path.join(datadir, f"b{i}.rrc") for i in range(1, 5)
        ),
        do_rrc_pan=True,
        slices=8,
        sections=1,
        section_overlap=64,
        pixels_per_line=512,
    )
    path = run_sharded_align(
        os.path.join(datadir, "P.PAN.RAW"),
        os.path.join(datadir, "P.MSS.RAW"),
        out_dir=os.path.join(datadir, "out_multi"),
        write_rrcpan=True,
        **kwargs,
    )
    # write_tiff=False in a multi-host run: the raster replicates over the
    # mesh so EVERY process returns the identical full host array
    import numpy as np

    arr = run_sharded_align(
        os.path.join(datadir, "P.PAN.RAW"),
        os.path.join(datadir, "P.MSS.RAW"),
        write_tiff=False,
        **kwargs,
    )
    np.save(os.path.join(datadir, f"gathered_{procid}.npy"), arr)
    print(f"align worker {procid} done: {path}", flush=True)


if __name__ == "__main__":
    main()

"""Pipeline orchestrators (the reference's pipeline classes, SURVEY §2):

- preprocessor.PreProcessor — inter-band registration + alignment (C2)
- stitcher.Stitcher / stitch — dual-CMOS prestitch + stitch writers (C3, C11)
- auxsep.AuxSeparator — downlink frame separation (C4)
- device_pipeline.make_device_pipeline — the fused single-chip scene
  pipeline (the throughput path measured by bench.py)
"""

from .auxsep import AuxSeparator  # noqa: F401
from .device_pipeline import make_device_pipeline, register_fast  # noqa: F401
from .preprocessor import PreProcessor  # noqa: F401
from .stitcher import Stitcher, stitch  # noqa: F401

"""opticalimageprocessor_tpu — TPU-native optical satellite image
pre-processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``arloan/OpticalImageProcessor`` (dual-CMOS push-broom PAN/MSS pipelines:
downlink aux separation, relative radiometric correction, phase-correlation
registration, cubic-resampling band alignment, CMOS stitching), designed
TPU-first: tiled device kernels, line-axis sharding over device meshes with
halo exchange, and a streaming host runtime.
"""

__version__ = "0.1.0"

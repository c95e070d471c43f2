from lbic_tpu.engine.wavefront import (
    WavefrontCodec,
    Schedule,
    make_schedule,
    min_slope,
    composite_offsets,
)
from lbic_tpu.engine.wavefront import closed_loop_scan  # noqa

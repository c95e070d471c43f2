from lbic_tpu.ops.blockfold import block_fold, block_unfold
from lbic_tpu.ops.bound import lower_bound, nonneg_init, nonneg_apply
from lbic_tpu.ops.masked_conv import (
    make_mask,
    conv2d,
    masked_conv_init,
    conv_apply,
)
from lbic_tpu.ops.gdn import gdn_init, gdn_apply
from lbic_tpu.ops.entropy import (
    SCALES_MIN,
    SCALES_MAX,
    SCALES_LEVELS,
    get_scale_table,
    gaussian_likelihood,
    quantize_noise,
    quantize_dequantize,
    quantize_symbols,
    dequantize,
    build_indexes,
    build_gaussian_cdfs,
)

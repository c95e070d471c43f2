from lbic_tpu.coding.cdf import pmf_to_quantized_cdf_np
from lbic_tpu.coding.api import (
    BufferedRansEncoder,
    RansDecoder,
    encode_with_indexes,
    backend_name,
)

from lbic_tpu.models.lbic import (
    ModelDef,
    make_model_def,
    init_params,
    forward_open_loop,
    analysis_full,
    synthesis_full,
    meanscale_full,
    meanscale_window,
    analysis_block,
    synthesis_block,
)
from lbic_tpu.models.postproc import postproc_init, postproc_apply

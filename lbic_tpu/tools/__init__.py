from lbic_tpu.tools.bd import bd_rate, bd_psnr, bd_from_results

from lbic_tpu.data.dataset import (
    ImageDatasetACL,
    BatchLoader,
    list_images,
    load_image,
    save_image,
    acl_dir,
)

from weaklysuperviseddl_tpu.data.dataset import (  # noqa: F401
    PetDataset,
    download_data,
    load_split_data,
)
from weaklysuperviseddl_tpu.data.synthetic import synthetic_pet_arrays  # noqa: F401
from weaklysuperviseddl_tpu.data.loader import batches, Batch  # noqa: F401
from weaklysuperviseddl_tpu.data.mask_store import MaskStore  # noqa: F401

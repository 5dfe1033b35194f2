from vqa_transfer_externaldata_tpu.data.datasets import (  # noqa: F401
    ArrayDataset, load_dataset, synthetic_vlmap, synthetic_vqa)

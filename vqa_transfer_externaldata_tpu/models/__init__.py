from vqa_transfer_externaldata_tpu.models.zoo import build_model, MODELS  # noqa: F401

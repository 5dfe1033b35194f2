from vqa_transfer_externaldata_tpu.ops import attention, gru, layers  # noqa: F401

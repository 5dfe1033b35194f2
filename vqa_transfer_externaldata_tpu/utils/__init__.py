from vqa_transfer_externaldata_tpu.utils.logging import log, Timer  # noqa: F401

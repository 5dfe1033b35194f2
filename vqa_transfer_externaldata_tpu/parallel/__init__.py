from vqa_transfer_externaldata_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, create_mesh, replicated)
from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer  # noqa: F401

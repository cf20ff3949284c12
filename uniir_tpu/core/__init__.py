from uniir_tpu.core.config import Config, load_config, save_config, parse_image_size
from uniir_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    replicated,
    data_sharded,
    shard_batch,
    is_main_process,
    maybe_initialize_distributed,
)

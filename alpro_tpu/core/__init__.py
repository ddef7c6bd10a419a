from alpro_tpu.core.config import Config, load_json_config, parse_with_config
from alpro_tpu.core.mesh import make_mesh, data_sharding, replicated_sharding

from audio_intelligence_tpu.utils.config import (
    AttrDict,
    update_params,
    instantiate_from_spec,
    parse_data_specifier,
    load_config,
)

from .whisper_jax import (  # noqa: F401
    WhisperDims,
    TINY_TEST_DIMS,
    init_params,
    encode,
    decode_full,
    decode_step,
    init_cache,
    KVCache,
    cast_params,
    count_parameters,
    sinusoids,
)
from .load import (  # noqa: F401
    WhisperModel,
    load_model,
    available_models,
    from_openai_state_dict,
    from_hf_state_dict,
    dims_from_hf_config,
)
from .alignment_heads import ALIGNMENT_HEADS, get_alignment_heads  # noqa: F401

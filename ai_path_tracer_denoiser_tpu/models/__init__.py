from .autoencoder import (  # noqa: F401
    init_autoencoder,
    init_hidden,
    apply_frame,
    apply_sequence,
    param_count,
)
from .export import (save_model, load_model,  # noqa: F401
                     model_options_from_meta,  # noqa: F401
                     model_options_from_params)  # noqa: F401
from .inference import (  # noqa: F401
    apply_frame_fast,
    apply_frame_fast_padded,
    apply_sequence_fast,
    fold_batchnorm,
    padded_resolution,
    prepare_inference,
)

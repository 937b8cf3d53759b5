from rrs_tpu.mtmd.clip import (          # noqa: F401
    ClipConfig,
    ClipWeights,
    encode_image,
    load_mmproj,
    preprocess_image,
    random_clip_weights,
)

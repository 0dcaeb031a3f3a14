from delfos_etl_pipeline_spark.multimodal.binary import (  # noqa: F401
    attach_binary_payload,
    byte_histogram_features,
    decode_image_batch,
    sample_video_frames,
)

from anomaly_detector_faironchain_spark.streaming.incremental import (  # noqa: F401
    validate_stream,
)

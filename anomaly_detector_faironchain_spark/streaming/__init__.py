from anomaly_detector_faironchain_spark.streaming.curation import (  # noqa: F401
    curate_stream,
)
from anomaly_detector_faironchain_spark.streaming.incremental import (  # noqa: F401
    validate_stream,
)

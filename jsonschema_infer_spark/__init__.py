"""jsonschema_infer_spark — a PySpark-native schema-inference +
constraint-validation engine with the capabilities of
JLugagne/jsonschema-infer, rebuilt Spark-first (see SURVEY.md)."""

from .config import InferConfig, CustomFormat, default_config, DRAFT06, DRAFT07
from .operators.infer_local import SchemaInferrer, NoSamplesError

__all__ = [
    "InferConfig", "CustomFormat", "default_config", "DRAFT06", "DRAFT07",
    "SchemaInferrer", "NoSamplesError",
]

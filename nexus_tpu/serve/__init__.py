from nexus_tpu.serve.service import InferenceService, TextRetrievalService  # noqa: F401

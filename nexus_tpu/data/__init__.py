from nexus_tpu.data.attrs import DataAttr4Model, Statistics  # noqa: F401

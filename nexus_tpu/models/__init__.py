from nexus_tpu.models.bert import BertConfig, BertEncoderModel, pool_hidden_states  # noqa: F401
from nexus_tpu.models.hf_convert import (  # noqa: F401
    load_hf_bert,
    torch_bert_to_flax,
)

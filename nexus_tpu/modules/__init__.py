"""Shared NN building blocks (JAX/Flax), mirroring Nexus/modules.

Everything here is either a pure function, a lightweight configured callable
(losses, scorers, metrics, samplers), or a `flax.linen.Module` (layers,
encoders, embeddings). All are jit/pjit-compatible with static shapes.
"""

from nexus_tpu.modules.activations import Dice, get_activation  # noqa: F401
from nexus_tpu.modules.loss import (  # noqa: F401
    BCELoss,
    BCEWithLogitLoss,
    BinaryCrossEntropyLoss,
    BPRLoss,
    CCLLoss,
    CrossEntropyLoss,
    HingeLoss,
    InBatchSoftmaxLoss,
    InfoNCELoss,
    KLDivLoss,
    M3KDLoss,
    MSELoss,
    NCELoss,
    SampledSoftmaxLoss,
    SoftmaxLoss,
    SquareLoss,
    Top1Loss,
    WeightedBPRLoss,
    WeightedBinaryCrossEntropyLoss,
    l2_reg_loss_fn,
    get_loss,
)
from nexus_tpu.modules.score import (  # noqa: F401
    CosineScorer,
    EuclideanScorer,
    GMFScorer,
    InnerProductScorer,
    IPTextRetrievalScorer,
    MLPScorer,
    NormScorer,
    get_scorer,
)
from nexus_tpu.modules.layers import (  # noqa: F401
    FC,
    ActivationUnit,
    HStackModule,
    LambdaModule,
    MLPModule,
    SENet,
)
from nexus_tpu.modules.embedding import MultiFeatEmbedding  # noqa: F401
from nexus_tpu.modules.feature_interaction import (  # noqa: F401
    CrossNetwork,
    FactorizationMachine,
    MultiExperts,
    MultiSENet,
)
from nexus_tpu.modules.aggregate import (  # noqa: F401
    AverageAggregator,
    DeepInterestAggregator,
    LastItemAggregator,
    SelfAttentiveAggregator,
    get_seq_aggregator,
)
from nexus_tpu.modules.encoders import (  # noqa: F401
    MLPItemEncoder,
    MLPQueryEncoder,
    SASRecEncoder,
)
from nexus_tpu.modules.metrics import get_eval_metrics  # noqa: F401
from nexus_tpu.modules.optimizer import get_lr_scheduler, get_optimizer  # noqa: F401

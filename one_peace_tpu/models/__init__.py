from . import components, rel_pos  # noqa: F401
from .classify import OnePeaceClassifyModel  # noqa: F401
from .encoder import FusionEncoder  # noqa: F401
from .one_peace import (  # noqa: F401
    ClassifyHead,
    ModelWrapper,
    OnePeaceRetrievalModel,
)
from .pretrain import OnePeacePretrainModel  # noqa: F401

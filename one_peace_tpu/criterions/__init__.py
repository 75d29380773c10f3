from . import losses  # noqa: F401
from .criterions import (  # noqa: F401
    AudioTextPretrainCriterion,
    AudioTextRetrievalCriterion,
    ClassifyCriterion,
    HingeCriterion,
    ImageTextPretrainCriterion,
    ImageTextRetrievalCriterion,
    RefCOCOCriterion,
    build_criterion,
)
from . import vision_criterions  # noqa: F401

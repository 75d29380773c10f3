"""Vision-branch transfer components (SURVEY.md §2.4).

The ImageNet classification transfer is already covered by the main
framework (image branch + ClassifyHead via the ``image_classify`` task).
This package holds the pieces specific to dense-prediction transfer:

- ``ms_deform_attn``: multi-scale deformable attention, the TPU-native
  equivalent of the reference's 1.3k-line CUDA op (seg/ops/src/cuda/);
- ``backbone``: the vision-branch feature extractor returning pyramid
  feature maps for detection/segmentation heads;
- ``det_backbone``: the reference detection trunk — windowed attention
  with interleaved global layers + the learned ViTDet
  SimpleFeaturePyramid (ref det/models/onepeace.py);
- ``video``: temporal classification over frame sequences (K400-style).
"""

from .det_backbone import (  # noqa: F401
    DetBackbone,
    SimpleFeaturePyramid,
    window_partition,
    window_unpartition,
)
from .ms_deform_attn import ms_deform_attn_core  # noqa: F401
from .zoo import (  # noqa: F401
    OnePeaceDetector,
    OnePeaceSegmenter,
    OnePeaceVideoClassifier,
)

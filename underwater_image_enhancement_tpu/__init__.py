"""underwater_image_enhancement_tpu — a TPU-native (JAX/XLA/Pallas) underwater
image enhancement framework.

A ground-up re-design of the capabilities of the reference project
`submarine0418/underwater_image_enhancement` (a CPU/CUDA research toolkit) as a
TPU-first framework:

- ``ops``       pure-JAX / Pallas image kernels (colorspace, guided filter,
                CLAHE, dark-channel dehazing, quadtree airlight, edges, DCT,
                LBP/GLCM, resize) — replaces the reference's OpenCV calls.
- ``pipeline``  jitted NHWC-batch strategy compositions + the public
                ``enhance()`` API (reference: enhancement_strategies.py,
                six_stadigy.py).
- ``metrics``   batched no-reference quality assessment
                (reference: quality_assessment.py) plus UIQM/UCIQE.
- ``features``  the 79-dim hand-crafted feature extractor
                (reference: feature_extraction.py).
- ``models``    Flax parameter-predictor networks + differentiable
                enhancement (reference: vgg_16_UIE.py,
                deep_learning_parameters.py, model_architectures.py).
- ``train``     optax/orbax training loops with checkpoint/resume/early-stop.
- ``select``    self-supervised strategy-selection system
                (reference: main.py).
- ``parallel``  device-mesh data/spatial parallelism (new capability; the
                reference is single-GPU only).

Conventions: images are NHWC float32 in [0, 1]; batched APIs are jittable and
vmappable; single-image helpers add/remove the batch dim.
"""

from underwater_image_enhancement_tpu.version import __version__

__all__ = ["__version__"]

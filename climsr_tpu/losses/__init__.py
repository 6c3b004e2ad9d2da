# -*- coding: utf-8 -*-
"""Loss functions: VGG perceptual, relativistic adversarial, pixel."""
from climsr_tpu.losses.perceptual import build_perceptual_loss  # noqa: F401
from climsr_tpu.losses.gan import bce_with_logits, relativistic_d_loss, relativistic_g_loss  # noqa: F401

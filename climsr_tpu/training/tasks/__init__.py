# -*- coding: utf-8 -*-
"""Training tasks: pixel-loss pre-training and relativistic GAN."""
from climsr_tpu.training.tasks.pretrain import make_pretrain_step, make_eval_step  # noqa: F401
from climsr_tpu.training.tasks.gan import make_gan_step  # noqa: F401

# -*- coding: utf-8 -*-
"""Shared string constants and dataset schema.

Parity surface: reference ``climsr/consts/`` (11 modules) — same names and
values so feather indices, batch dicts and config files remain interchangeable.
"""
from climsr_tpu.consts import batch_items  # noqa: F401
from climsr_tpu.consts import cruts  # noqa: F401
from climsr_tpu.consts import datasets_and_preprocessing  # noqa: F401
from climsr_tpu.consts import models  # noqa: F401
from climsr_tpu.consts import plotting  # noqa: F401
from climsr_tpu.consts import result_inspection  # noqa: F401
from climsr_tpu.consts import stages  # noqa: F401
from climsr_tpu.consts import stats  # noqa: F401
from climsr_tpu.consts import training  # noqa: F401
from climsr_tpu.consts import world_clim  # noqa: F401

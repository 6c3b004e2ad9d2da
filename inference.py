#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Inference entry point (reference parity: inference.py).

Two modes, like the reference's two hydra entries:
    python inference.py inference=inference_esrgan [key=value ...]
    python inference.py --inspect-results [key=value ...]
"""
import sys

if "--inspect-results" in sys.argv:
    sys.argv.remove("--inspect-results")
    from climsr_tpu.cli.inspect_results import main
else:
    from climsr_tpu.cli.inference import main

if __name__ == "__main__":
    main()

"""Encode pipeline: the reference's 12 process kernels collapsed into
TPU phases (SURVEY.md §7.1): analyze -> ME -> decide -> encode/recon ->
entropy+pack.  TPU stages are jitted batched functions; host stages are
serialization.
"""

"""Compute kernels: single-source numpy/JAX implementations of the
VP9-normative math (transforms, intra prediction, interpolation, loop
filter) plus encoder-side ops (forward transforms, quantization, SAD).

Functions are written against an array-namespace parameter ``xp`` so the
same butterfly code runs bit-exactly under numpy (host oracle / decoder)
and jax.numpy (TPU batched path); tests assert equality.
"""

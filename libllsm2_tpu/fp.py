"""Working-precision switch (reference: ciglet's compile-time FP_TYPE
macro -- the whole C library builds as float or double; here the analog
is an import-time environment knob, since JAX fixes x64 support at
startup).

Set ``LLSM_FP64=1`` in the environment BEFORE importing libllsm2_tpu to
run the numeric core in float64.  This is a CPU-only mode (TPUs have no
f64 units; ``use_pallas`` is rejected under it) intended for
golden-reference generation and future cross-validation against the C
reference built with ``FP_TYPE=double`` (SURVEY.md section 2, Build row;
VERDICT r2 missing #4).  The default build is float32 -- the TPU-native
working precision -- and is bit-for-bit unaffected by this module.
"""
import os

import jax
import jax.numpy as jnp

FP64: bool = os.environ.get("LLSM_FP64", "0") not in ("", "0")
if FP64:
    jax.config.update("jax_enable_x64", True)

#: real working dtype of the numeric core (FP_TYPE analog)
FP = jnp.float64 if FP64 else jnp.float32
#: complex working dtype (spectra, analytic signals)
CP = jnp.complex128 if FP64 else jnp.complex64

import jax

# Numerical tests (solver order, torch parity) need float64 available; model
# code is dtype-explicit so this does not change framework behavior.
jax.config.update("jax_enable_x64", True)

"""fiude_tpu — TPU-native Universal Differential Equation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``M-Morris-95/Forecasting-Influenza-Using-Universal-Differential-Equations``:
variational GRU encoders -> SIR-structured latent neural/universal ODEs ->
Monte-Carlo probabilistic ILI forecasts, with training, evaluation, sweep
orchestration and multi-chip scaling built TPU-first.
"""

__version__ = "0.1.0"

from fiude_tpu.ops.integrate import (
    odeint_adaptive,
    odeint_tsit5,
    odeint,
    odeint_grid,
    odeint_dopri5,
    STAGES,
)
from fiude_tpu.ops.stats import (
    normal_logpdf,
    kl_normal,
    mean_std,
    std,
    masked_mean,
    masked_mean_std,
)
from fiude_tpu.ops.adjoint import odeint_adjoint
from fiude_tpu.ops.pallas_ude import FusedForecaster, fused_trajectory_decode
from fiude_tpu.ops.pallas_bayes import (
    FusedBayesForecaster,
    fused_bayes_trajectory_decode,
)
from fiude_tpu.ops.pallas_gru_train import (
    fused_backgru_train_apply,
)
from fiude_tpu.ops.pallas_train import (
    cm_permute_traceable,
    fused_train_trajectory,
)

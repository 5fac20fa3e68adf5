from fiude_tpu.train.losses import (
    AnnealConfig,
    LossConfig,
    TRAINING_INFO,
    compute_loss,
    kl_annealing,
    nll_loss,
    mse_loss,
    kl_z_loss,
    kl_params_loss,
    fa_norm_loss,
    latent_init_loss,
)
from fiude_tpu.train.trainer import Trainer, TrainState, warm_up_lr
from fiude_tpu.train.checkpoint import save_params, load_params, tree_to_flat_dict
from fiude_tpu.train.experiment import (
    adaptive_curriculum_train,
    rerun_best,
    run_experiment,
    run_transfer,
    run_tuning_worker,
)
from fiude_tpu.train.torch_compat import params_from_torch_checkpoint

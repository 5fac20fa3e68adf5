from fiude_tpu.parallel.mesh import (
    make_mesh, data_mesh, sample_data_mesh, config_mesh, named,
)
from fiude_tpu.parallel.train_step import (
    make_sharded_train_step, make_sharded_forecast,
    make_fused_sharded_train_step,
)
from fiude_tpu.parallel.serving import ShardedFusedForecaster
from fiude_tpu.parallel.tp import tp_shardings, tp_spec
from fiude_tpu.parallel.sweep import (
    PopulationTrainer, make_population_train_step, run_work_queue,
    stack_trees, unstack_tree,
)

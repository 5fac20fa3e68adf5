from fiude_tpu.utils.history import History
from fiude_tpu.utils import metrics
from fiude_tpu.utils.config import REGION_INFO, ExperimentConfig, grid, reference_main_grid
from fiude_tpu.utils.ledger import Ledger
from fiude_tpu.utils.results import evaluate_forecast, test_and_record, upsert_results_row
from fiude_tpu.utils.logging import get_logger
from fiude_tpu.utils import latent_ode
from fiude_tpu.utils import profiler

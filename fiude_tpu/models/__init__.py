from fiude_tpu.models.nn import Dense, dense, init_dense, init_dense_normal, elu_mlp, relu_mlp
from fiude_tpu.models.encoders import (
    BackGRUEncoder,
    BiGRUEncoder,
    MISOGRUEncoder,
    BiLSTMEncoder,
    GenericEncoder,
    sir_scaler_vector,
)
from fiude_tpu.models.decoder import LinearDecoder
from fiude_tpu.models.rhs import SIRRates, NeuralAug, UDE, empirical_rate_posterior
from fiude_tpu.models.bayes import (
    BayesSIRRates,
    BayesNeuralAug,
    BayesUDE,
    DenseVariationalParams,
    dense_variational,
    init_dense_variational,
    variational_kl,
)
from fiude_tpu.models.vae import UDEForecaster, UDEForecasterParams, reparam, make_prior

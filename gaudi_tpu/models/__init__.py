from gaudi_tpu.models.egnn import (
    coord2diff,
    SinusoidsEmbedding,
    DenseGCL,
    DenseEquivariantUpdate,
    EquivariantBlock,
    DynamicsEGNN,
    EGNNDynamics,
)
from gaudi_tpu.models.predictor import EGNNPredictor

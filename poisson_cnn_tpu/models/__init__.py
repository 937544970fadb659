from .hpnn import HPNN, HPNNConfig
from .dbcnn import DBCNN, DBCNNConfig, stable_sinh_modes
from .pcnn import PCNN, PCNNConfig

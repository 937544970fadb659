from .hpnn import HPNN, HPNNConfig
from .hpnn_fast import HPNNFast, HPNNFastConfig, load_fast_config
from .dbcnn import DBCNN, DBCNNConfig, stable_sinh_modes
from .dbcnn_fast import DBCNNFast, DBCNNFastConfig
from .pcnn import PCNN, PCNNConfig
from .unet import UNet, UNetConfig, ConvBlock
from .pix2pix import Pix2PixGenerator, Pix2PixConfig
from .dbc_rnn import DBCRNN, DBCRNNConfig
from .autoencoder import FourierAutoencoderHPNN, FourierAutoencoderConfig
from .metalearning_models import (
    MetaHPNN,
    MetaHPNNConfig,
    MetaDBCNN,
    MetaDBCNNConfig,
)
from .gan import (
    DiscriminatorConfig,
    PoissonDiscriminator,
    gan_loss_fns,
    make_gan_train_step,
)
from .hpnn_fluidnet import FluidnetHPNN, FluidnetHPNNConfig

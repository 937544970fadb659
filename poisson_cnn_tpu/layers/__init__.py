from .core import (
    norm_layer,
    pad_spatial,
    PadConv,
    ResNetBlock,
    spatial_pyramid_pool,
    SpatialPyramidPool,
    Upsample,
    DeconvUpscale,
    MergeWithAttention,
    WeightedContraction,
    JacobiIterationLayer,
    Scaling,
)
from .metalearning import (
    per_sample_conv,
    per_sample_conv_transpose,
    KernelHypernetwork,
    MetaConv,
    MetaDeconvUpscale,
    MetaResNetBlock,
)
from .blocks import BottleneckBlock, MetaBottleneckBlock
from .subdomain import SubdomainSPPBlock

from .conv import Conv2d, ConvTranspose2d, BatchNorm2d, Linear  # noqa: F401
from .encoders import (  # noqa: F401
    EncoderMNIST, DecoderMNIST, EncoderSVHN, DecoderSVHN,
    MLPEncoder, MLPDecoder, EncoderOASIS, DecoderOASIS,
    TwoStepsEncoder, TwoStepsDecoder,
)
from .joint_encoders import (  # noqa: F401
    JointMLPEncoder, DoubleHeadMLP, DoubleHeadJoint, MultipleHeadJoint,
)

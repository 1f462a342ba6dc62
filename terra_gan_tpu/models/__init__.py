from .generator import PConvUNet, PConv2d
from .discriminator import Discriminator

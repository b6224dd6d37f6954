from adipose_tpu.models.unet import DilatedUNet
from adipose_tpu.models.inception import InceptionV3Classifier

__all__ = ["DilatedUNet", "InceptionV3Classifier"]

from .wav import read_wav, write_wav, resample
from .label_encoders import LabelEncoder, dump_label_encoders, load_label_encoders

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "LabelEncoder",
    "dump_label_encoders",
    "load_label_encoders",
]

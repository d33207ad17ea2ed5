from .wav import read_wav, write_wav, resample
from .label_encoders import LabelEncoder, dump_label_encoders, load_label_encoders
from .lmdb_compat import (LMDBCodesDataset, LMDBReader, LMDBWriter,
                          open_codes_dataset, write_codes_lmdb)

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "LabelEncoder",
    "dump_label_encoders",
    "load_label_encoders",
    "LMDBCodesDataset",
    "LMDBReader",
    "LMDBWriter",
    "open_codes_dataset",
    "write_codes_lmdb",
]

"""Dataset split tool (create_nsynth_dataset_split.py equivalent).

Reference (``create_nsynth_dataset_split.py:14-72``): merge ``examples.json``
metadata across NSynth directories, split 80/20 with fixed seed 20200117,
write per-split ``examples.json`` files. The fixed seed is part of the
pipeline contract (SURVEY.md section 7 layer 2), reproduced here with the
same train_test_split shuffling semantics (numpy permutation).
"""

from __future__ import annotations

import argparse
import json
import pathlib
from typing import Dict, Sequence

import numpy as np

SPLIT_SEED = 20200117


def train_test_split_keys(keys: Sequence[str], test_size: float = 0.2,
                          seed: int = SPLIT_SEED):
    """Deterministic shuffled split (sklearn train_test_split semantics:
    permute, last ceil(n*test_size) go to test)."""
    keys = list(keys)
    n = len(keys)
    n_test = int(np.ceil(n * test_size))
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    test_idx = set(perm[:n_test].tolist())
    train = [keys[i] for i in range(n) if i not in test_idx]
    test = [keys[i] for i in range(n) if i in test_idx]
    return train, test


def create_split(dataset_directories, output_directory,
                 test_size: float = 0.2, seed: int = SPLIT_SEED
                 ) -> Dict[str, pathlib.Path]:
    merged: Dict[str, dict] = {}
    for directory in dataset_directories:
        json_path = pathlib.Path(directory) / "examples.json"
        with open(json_path) as f:
            merged.update(json.load(f))
    train_keys, valid_keys = train_test_split_keys(
        sorted(merged.keys()), test_size=test_size, seed=seed)
    output_directory = pathlib.Path(output_directory)
    out = {}
    for split, keys in (("train", train_keys), ("valid", valid_keys)):
        split_dir = output_directory / split
        split_dir.mkdir(parents=True, exist_ok=True)
        path = split_dir / "examples.json"
        with open(path, "w") as f:
            json.dump({k: merged[k] for k in keys}, f)
        out[split] = path
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Merge NSynth examples.json files and write a fixed-"
                    "seed train/valid split")
    parser.add_argument("--dataset_directories", type=str, nargs="+",
                        required=True)
    parser.add_argument("--output_directory", type=str, required=True)
    parser.add_argument("--test_size", type=float, default=0.2)
    parser.add_argument("--seed", type=int, default=SPLIT_SEED)
    args = parser.parse_args()
    paths = create_split(args.dataset_directories, args.output_directory,
                         args.test_size, args.seed)
    for split, path in paths.items():
        print(f"{split}: {path}")


if __name__ == "__main__":
    main()

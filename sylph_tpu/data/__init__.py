"""Data layer: dataset catalog, episodic few-shot datasets, host-side
transforms, fixed-shape batch assembly, loaders.

TPU-first design: all randomness and ragged work (decode, resize, GT
padding, support-box selection) happens on host; what crosses to the
device is a pytree of static-shape numpy arrays, so every train/eval
step reuses one compiled graph (the reference instead pads per batch and
eats recompiles — meta_one_stage_detector.py:174-178)."""

from .catalog import DatasetCatalog, MetadataCatalog, register_all_coco
from .class_splits import (COCO_BASE_CLASSES, COCO_NOVEL_CLASSES,
                           coco_split_ids, lvis_split_ids)
from .meta_dataset import MetaDataset, load_coco_json, temp_seed
from .mapper import EpisodicMapper
from .loader import (build_episodic_train_loader, build_query_loader,
                     build_support_set_loader)

__all__ = [
    "DatasetCatalog", "MetadataCatalog", "register_all_coco",
    "COCO_BASE_CLASSES", "COCO_NOVEL_CLASSES", "coco_split_ids",
    "lvis_split_ids", "MetaDataset", "load_coco_json", "temp_seed",
    "EpisodicMapper", "build_episodic_train_loader",
    "build_support_set_loader", "build_query_loader",
]

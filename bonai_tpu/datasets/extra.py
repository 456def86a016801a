"""Non-COCO dataset shims: VOC (XML), LVIS, Cityscapes, WIDER FACE.

reference: ``mmdet/datasets/xml_style.py`` (XMLDataset), ``voc.py``,
``lvis.py``, ``cityscapes.py``, ``wider_face.py``.  SURVEY §7 descopes
full rebuilds; these shims provide the same config surface (type names,
CLASSES, annotation parsing, evaluate) on top of the in-repo COCO/XML
machinery so reference configs for those benchmarks load and run.
"""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np

from .coco import CocoDataset
from .pipelines import build_pipeline


class XMLDataset:
    """Pascal-VOC-style XML annotations (reference ``xml_style.py``).

    ``ann_file``: text file of image ids; ``img_prefix``: the
    ``VOC2007/``-style root with JPEGImages/ and Annotations/.
    """
    CLASSES = None

    def __init__(self, ann_file, pipeline, img_prefix="", classes=None,
                 test_mode=False, filter_empty_gt=True, min_size=None,
                 img_subdir="JPEGImages", ann_subdir="Annotations",
                 **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.test_mode = test_mode
        self.min_size = min_size
        if classes is not None:
            self.CLASSES = classes
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        self.data_infos = self.load_annotations(ann_file)
        if not test_mode and filter_empty_gt:
            keep = [i for i in range(len(self.data_infos))
                    if len(self.get_ann_info(i)["bboxes"])]
            self.data_infos = [self.data_infos[i] for i in keep]
        self.pipeline = build_pipeline(pipeline)

    def __len__(self):
        return len(self.data_infos)

    def load_annotations(self, ann_file):
        infos = []
        with open(ann_file) as f:
            ids = [ln.strip() for ln in f if ln.strip()]
        for img_id in ids:
            filename = osp.join(self.img_subdir, f"{img_id}.jpg")
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f"{img_id}.xml")
            width = height = 0
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find("size")
                if size is not None:
                    width = int(size.find("width").text)
                    height = int(size.find("height").text)
            infos.append(dict(id=img_id, filename=filename,
                              width=width, height=height))
        return infos

    def get_ann_info(self, idx):
        img_id = self.data_infos[idx]["id"]
        xml_path = osp.join(self.img_prefix, self.ann_subdir,
                            f"{img_id}.xml")
        bboxes, labels = [], []
        if osp.exists(xml_path):
            root = ET.parse(xml_path).getroot()
            for obj in root.findall("object"):
                name = obj.find("name").text
                if name not in self.cat2label:
                    continue
                difficult = obj.find("difficult")
                if difficult is not None and int(difficult.text):
                    continue
                bb = obj.find("bndbox")
                box = [float(bb.find(t).text) - (1 if t.endswith("min")
                                                 else 0)
                       for t in ("xmin", "ymin", "xmax", "ymax")]
                w = box[2] - box[0]
                h = box[3] - box[1]
                if self.min_size and (w < self.min_size
                                      or h < self.min_size):
                    continue
                bboxes.append(box)
                labels.append(self.cat2label[name])
        return dict(bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int64), masks=[],
                    offsets=np.zeros((len(bboxes), 2), np.float32))

    def evaluate(self, results, metric="mAP", iou_thr=0.5, **kwargs):
        """VOC mAP over per-image per-class det lists (reference
        ``voc.py:24-87``)."""
        from ..evaluation.mean_ap import eval_map
        anns = [self.get_ann_info(i) for i in range(len(self))]
        mean_ap, per_class = eval_map(results, anns, iou_thr=iou_thr)
        return {"mAP": mean_ap}


class VOCDataset(XMLDataset):
    """reference ``voc.py:9-87``."""
    CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog",
               "horse", "motorbike", "person", "pottedplant", "sheep",
               "sofa", "train", "tvmonitor")

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if "VOC2007" in self.img_prefix:
            self.year = 2007
        elif "VOC2012" in self.img_prefix:
            self.year = 2012
        else:
            self.year = None


class WIDERFaceDataset(XMLDataset):
    """reference ``wider_face.py:12-51``."""
    CLASSES = ("face",)

    def load_annotations(self, ann_file):
        infos = super().load_annotations(ann_file)
        # WIDER layout: images live under per-event folders encoded in
        # the id ("0--Parade/xxx"); sizes are fixed per the converted
        # annotations
        for info in infos:
            info["filename"] = osp.join(self.img_subdir,
                                        f"{info['id']}.jpg")
        return infos


class LVISDataset(CocoDataset):
    """reference ``lvis.py`` — LVIS v0.5/v1 jsons differ from COCO only
    in image fields ('coco_url' instead of 'file_name') and federated
    annotation flags; category names come from the json."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for info in self.data_infos:
            if not info.get("filename") and info.get("coco_url"):
                # http://images.cocodataset.org/train2017/xxx.jpg
                info["filename"] = "/".join(
                    info["coco_url"].split("/")[-2:])


class CityscapesDataset(CocoDataset):
    """reference ``cityscapes.py:33-321`` (COCO-converted jsons)."""
    CLASSES = ("person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")


class DeepFashionDataset(CocoDataset):
    """reference ``deepfashion.py:1-14`` (COCO-format DeepFashion2
    landmark/segmentation jsons)."""
    CLASSES = ("top", "skirt", "leggings", "dress", "outer", "pants",
               "bag", "neckwear", "headwear", "eyeglass", "belt",
               "footwear", "hair", "skin", "face")

#!/usr/bin/env python
"""ScanNet scene → NGP-style transforms.json + scaled images/labels.

Equivalent of the reference's offline converter
(ref: preprocessing_scripts/scannet2transform.py): per scene, load the color
intrinsics, rescale K from 1296x968 to 320x240, remap `label-filt` ids to
NYU-40 via the combined tsv, write `color_scaled/` + `label_40_scaled/`
(+ full-res `label_40/`), and emit transforms_{train,test}[_scaled
_semantics_40_raw].json — test frames are every 10th frame offset by 5.
"""

import argparse
import csv
import json
import os

import cv2
import numpy as np

W_UNSCALED, H_UNSCALED = 1296, 968
W_OUT, H_OUT = 320, 240
TEST_ID_STEP = 10


def load_nyu40_mapping(path):
    mapping = {}
    with open(os.path.join(path, "scannetv2-labels.combined.tsv")) as f:
        for i, line in enumerate(csv.reader(f, delimiter="\t")):
            if i == 0:
                continue
            mapping[int(line[0])] = int(line[4])
    return mapping


def scaled_intrinsics(k, sx, sy):
    k = k.copy()
    k[0, 0] *= sx
    k[1, 1] *= sy
    k[0, 2] *= sx
    k[1, 2] *= sy
    return k


def transforms_header(k, w, h):
    return {
        "fl_x": float(k[0, 0]), "fl_y": float(k[1, 1]),
        "cx": float(k[0, 2]), "cy": float(k[1, 2]),
        "w": w, "h": h,
        "camera_angle_x": float(np.arctan2(w / 2, k[0, 0]) * 2),
        "camera_angle_y": float(np.arctan2(h / 2, k[1, 1]) * 2),
        "aabb_scale": 16,
        "frames": [],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_folder", type=str, required=True)
    ap.add_argument("--scaled_image", action="store_true")
    ap.add_argument("--semantics", action="store_true")
    args = ap.parse_args()
    basedir = args.scene_folder

    frame_ids = sorted(int(os.path.splitext(f)[0])
                       for f in os.listdir(os.path.join(basedir, "color")))
    k_full = np.loadtxt(os.path.join(basedir, "intrinsic",
                                     "intrinsic_color.txt"))
    k_scaled = scaled_intrinsics(k_full, W_OUT / W_UNSCALED,
                                 H_OUT / H_UNSCALED)

    mapping = None
    if args.semantics:
        mapping = load_nyu40_mapping(basedir)
        # identity-initialized: ids absent from the tsv keep their raw value,
        # matching the reference's masked-assignment loop (ref scannet2
        # transform.py:151-153 — a zeroing LUT silently mapped them to 0)
        lut = np.arange(max(mapping) + 1, dtype=np.uint16)
        for sid, nid in mapping.items():
            lut[sid] = nid
        os.makedirs(os.path.join(basedir, "label_40"), exist_ok=True)
        os.makedirs(os.path.join(basedir, "label_40_scaled"), exist_ok=True)
    os.makedirs(os.path.join(basedir, "color_scaled"), exist_ok=True)

    train_ids = frame_ids
    # every 10th frame offset by 5 (ref :84-90)
    test_ids = [x + TEST_ID_STEP // 2 for x in train_ids
                if x + TEST_ID_STEP // 2 < len(frame_ids)][::TEST_ID_STEP]

    for ids, tag in ((train_ids, "train"), (test_ids, "test")):
        t_scaled = transforms_header(k_scaled, W_OUT, H_OUT)
        t_full = transforms_header(k_full, W_UNSCALED, H_UNSCALED)
        for fid in ids:
            pose = np.loadtxt(os.path.join(basedir, "pose",
                                           f"{fid}.txt")).reshape(4, 4)
            if np.any(np.isinf(pose)):
                continue
            if args.scaled_image:
                img = cv2.imread(os.path.join(basedir, "color", f"{fid}.jpg"))
                img = cv2.resize(img, (W_OUT, H_OUT),
                                 interpolation=cv2.INTER_AREA)
                cv2.imwrite(os.path.join(basedir, "color_scaled",
                                         f"{fid}.jpg"), img)
                if args.semantics:
                    sem = cv2.imread(
                        os.path.join(basedir, "label-filt", f"{fid}.png"),
                        cv2.IMREAD_UNCHANGED)
                    # ids beyond the tsv's max id pass through unchanged
                    # instead of crashing the LUT index (corrupt frame or
                    # tsv/scene version mismatch)
                    sem = np.where(sem < len(lut),
                                   lut[np.minimum(sem, len(lut) - 1)], sem)
                    sem_scaled = cv2.resize(sem, (W_OUT, H_OUT),
                                            interpolation=cv2.INTER_NEAREST)
                    cv2.imwrite(os.path.join(basedir, "label_40",
                                             f"{fid}.png"),
                                sem.astype(np.uint8))
                    cv2.imwrite(os.path.join(basedir, "label_40_scaled",
                                             f"{fid}.png"),
                                sem_scaled.astype(np.uint8))
            entry = {"file_path": f"color_scaled/{fid}.jpg",
                     "transform_matrix": pose.tolist()}
            entry_full = {"file_path": f"color/{fid}.jpg",
                          "transform_matrix": pose.tolist()}
            if args.semantics:
                entry["label_path"] = f"label_40_scaled/{fid}.png"
                entry_full["label_path"] = f"label_40/{fid}.png"
            t_scaled["frames"].append(entry)
            t_full["frames"].append(entry_full)

        suffix = "_semantics_40_raw" if args.semantics else ""
        if args.scaled_image:
            out = os.path.join(basedir,
                               f"transforms_{tag}_scaled{suffix}.json")
            with open(out, "w") as f:
                json.dump(t_scaled, f, indent=4)
        else:
            out = os.path.join(basedir, f"transforms_{tag}{suffix}.json")
            with open(out, "w") as f:
                json.dump(t_full, f, indent=4)
    print(f"processed {basedir}: {len(train_ids)} train / {len(test_ids)} "
          f"test frames")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ScanNet poses → NGP world normalization (final transforms_train/test.json).

Equivalent of the reference's converter
(ref: preprocessing_scripts/scannet2nerf.py): subsample every `interval`-th
frame, apply the OpenGL axis flips, rotate the average up-vector to +z,
center on the cameras' mutual point of attention (pairwise closest points of
viewing rays), scale so `one_m_to_scene_uom = 4.0/avglen*0.33`, and write
transforms_train.json / transforms_test.json carrying that scalar.
The O(N²) pairwise closest-point accumulation is kept as a readable double
loop — N is tiny (every 10th frame) and this is an offline CLI.
"""

import argparse
import copy
import json
import os

import numpy as np


def rotmat(a, b):
    """Rotation taking unit vector a to unit vector b (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    s = float(np.linalg.norm(v))
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat @ kmat * ((1 - c) / (s ** 2 + 1e-10))


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to rays o+t*d (t<=0 clamped) and a parallelism weight."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = float(np.linalg.norm(c)) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = min(ta, 0), min(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def center_of_attention(c2ws):
    """Weighted average of pairwise closest points of all camera rays."""
    totw, totp = 0.0, np.zeros(3)
    for i in range(len(c2ws)):
        mf = c2ws[i][0:3, :]
        for j in range(len(c2ws)):
            mg = c2ws[j][0:3, :]
            p, w = closest_point_2_lines(mf[:, 3], mf[:, 2], mg[:, 3],
                                         mg[:, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    return totp / totw if totw > 0 else np.zeros(3)


def opengl_normalize(c2w, room_center):
    c2w = c2w.copy()
    c2w[:3, 3] -= room_center
    c2w[0:3, 2] *= -1
    c2w[0:3, 1] *= -1
    c2w = c2w[[1, 0, 2, 3], :]
    c2w[2, :] *= -1
    return c2w


def _load_selected(json_path, scannet_folder, interval):
    names, poses = [], []
    with open(json_path) as f:
        transforms = json.load(f)
    for idx, frame in enumerate(transforms["frames"]):
        if idx % interval:
            continue
        name = os.path.basename(frame["file_path"]).split(".jpg")[0]
        c2w = np.loadtxt(os.path.join(scannet_folder, "pose", f"{name}.txt"))
        if np.any(np.isinf(c2w)):
            continue
        names.append(name)
        poses.append(c2w)
    return transforms, names, poses


def _emit(transforms, names, poses, uom, out_path):
    sel = copy.deepcopy(transforms)
    sel["frames"] = []
    cursor = 0
    for frame in transforms["frames"]:
        if cursor == len(names):
            break
        name = os.path.basename(frame["file_path"]).split(".jpg")[0]
        if name == names[cursor]:
            frame = dict(frame)
            frame["transform_matrix"] = poses[cursor].tolist()
            sel["frames"].append(frame)
            cursor += 1
    sel["one_m_to_scene_uom"] = uom
    with open(out_path, "w") as f:
        json.dump(sel, f, indent=4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_folder", type=str, required=True)
    ap.add_argument("--transform_train", type=str, required=True)
    ap.add_argument("--transform_test", type=str, required=True)
    ap.add_argument("--interval", default=10, type=int)
    args = ap.parse_args()

    t_train, names, c2ws = _load_selected(args.transform_train,
                                          args.scene_folder, args.interval)
    t_test, names_test, c2ws_test = _load_selected(
        args.transform_test, args.scene_folder, args.interval)

    room_center = np.zeros(3)
    c2ws = [opengl_normalize(p, room_center) for p in c2ws]
    c2ws_test = [opengl_normalize(p, room_center) for p in c2ws_test]

    up = sum(p[0:3, 1] for p in c2ws)
    up = up / np.linalg.norm(up)
    r = np.pad(rotmat(up, np.array([0.0, 0.0, 1.0])), [0, 1])
    r[-1, -1] = 1
    c2ws = [r @ p for p in c2ws]
    c2ws_test = [r @ p for p in c2ws_test]

    totp = center_of_attention(c2ws)
    for p in c2ws:
        p[0:3, 3] -= totp
    for p in c2ws_test:
        p[0:3, 3] -= totp

    avglen = float(np.mean([np.linalg.norm(p[0:3, 3]) for p in c2ws]))
    one_m_to_scene_uom = 4.0 / avglen * 0.33
    for p in c2ws + c2ws_test:
        p[0:3, 3] *= one_m_to_scene_uom
    print(f"avg camera distance {avglen:.3f}, "
          f"one_m_to_scene_uom {one_m_to_scene_uom:.4f}")

    _emit(t_train, names, c2ws, one_m_to_scene_uom,
          os.path.join(args.scene_folder, "transforms_train.json"))
    _emit(t_test, names_test, c2ws_test, one_m_to_scene_uom,
          os.path.join(args.scene_folder, "transforms_test.json"))


if __name__ == "__main__":
    main()

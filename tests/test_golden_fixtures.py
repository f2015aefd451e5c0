"""Golden-bytes fixtures: a hand-crafted COLMAP 3.12-schema database and a
hand-packed sparse-model directory, validated against OUR readers.

These fixtures are built from raw SQL + struct-packed blobs (never from
glomap_tpu's own writers), so the io layer is checked against the public
COLMAP byte contract rather than against itself (round-1 gap: the rig
table ingestion had only writer-generated coverage). Byte layouts follow
the COLMAP documentation: keypoints f32 row-major (rows x cols>=2),
matches/two_view_geometries u32 (rows x 2), camera params f64, model
files little-endian per scripts/python/read_write_model.py.
"""

import sqlite3
import struct

import numpy as np
import pytest

from glomap_tpu.io.database import MAX_IMAGE_ID, read_database

SENSOR_TYPE_CAMERA = 0


def _golden_database(path):
    db = sqlite3.connect(path)
    db.executescript("""
CREATE TABLE cameras (camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL, width INTEGER NOT NULL, height INTEGER NOT NULL,
    params BLOB, prior_focal_length INTEGER NOT NULL);
CREATE TABLE images (image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL);
CREATE TABLE keypoints (image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE matches (pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE two_view_geometries (pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL, F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
CREATE TABLE rigs (rig_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL);
CREATE TABLE rig_sensors (rig_id INTEGER NOT NULL,
    sensor_type INTEGER NOT NULL, sensor_id INTEGER NOT NULL,
    sensor_from_rig BLOB, PRIMARY KEY (sensor_type, sensor_id));
CREATE TABLE frames (frame_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    rig_id INTEGER NOT NULL);
CREATE TABLE frame_data (frame_id INTEGER NOT NULL,
    sensor_type INTEGER NOT NULL, data_id INTEGER NOT NULL,
    PRIMARY KEY (sensor_type, data_id));
""")
    # cameras: SIMPLE_RADIAL (id 2) with prior focal; PINHOLE (id 1) without
    db.execute("INSERT INTO cameras VALUES (?,?,?,?,?,?)",
               (1, 2, 1024, 768,
                struct.pack("<4d", 900.0, 512.0, 384.0, 0.01), 1))
    db.execute("INSERT INTO cameras VALUES (?,?,?,?,?,?)",
               (2, 1, 640, 480,
                struct.pack("<4d", 500.0, 510.0, 320.0, 240.0), 0))
    db.execute("INSERT INTO images VALUES (?,?,?)", (1, "a.jpg", 1))
    db.execute("INSERT INTO images VALUES (?,?,?)", (2, "b.jpg", 1))
    db.execute("INSERT INTO images VALUES (?,?,?)", (3, "c.jpg", 2))
    # keypoints: 6-col affine format for image 1 (x, y in cols 0-1),
    # 2-col for the others
    kp1 = struct.pack("<12f", 10.0, 20.0, 1, 0, 0, 1,
                      30.0, 40.0, 1, 0, 0, 1)
    db.execute("INSERT INTO keypoints VALUES (?,?,?,?)", (1, 2, 6, kp1))
    db.execute("INSERT INTO keypoints VALUES (?,?,?,?)",
               (2, 2, 2, struct.pack("<4f", 11.0, 21.0, 31.0, 41.0)))
    db.execute("INSERT INTO keypoints VALUES (?,?,?,?)",
               (3, 1, 2, struct.pack("<2f", 100.0, 200.0)))
    # two-view geometry for (1, 2) with matches, E/F/H and qvec/tvec
    pid = 1 * MAX_IMAGE_ID + 2
    m = struct.pack("<4I", 0, 1, 1, 0)  # feature matches (0->1, 1->0)
    F = np.arange(9, dtype=np.float64)
    E = np.arange(9, 18, dtype=np.float64)
    H = np.arange(18, 27, dtype=np.float64)
    q = np.asarray([0.5, 0.5, 0.5, 0.5])
    t = np.asarray([1.0, 2.0, 3.0])
    db.execute("INSERT INTO matches VALUES (?,?,?,?)", (pid, 2, 2, m))
    db.execute("INSERT INTO two_view_geometries VALUES (?,?,?,?,?,?,?,?,?,?)",
               (pid, 2, 2, m, 2, F.tobytes(), E.tobytes(), H.tobytes(),
                q.tobytes(), t.tobytes()))
    # rig with two sensors: camera 1 is the reference (NULL pose),
    # camera 2 carries sensor_from_rig = [qw qx qy qz tx ty tz]
    db.execute("INSERT INTO rigs VALUES (1)")
    db.execute("INSERT INTO rig_sensors VALUES (?,?,?,?)",
               (1, SENSOR_TYPE_CAMERA, 1, None))
    pose = struct.pack("<7d", 0.0, 0.0, 1.0, 0.0, 0.1, 0.2, 0.3)
    db.execute("INSERT INTO rig_sensors VALUES (?,?,?,?)",
               (1, SENSOR_TYPE_CAMERA, 2, pose))
    # frame 7 = {image 1 (cam 1), image 3 (cam 2)}; frame 8 = {image 2}
    db.execute("INSERT INTO frames VALUES (7, 1)")
    db.execute("INSERT INTO frames VALUES (8, 1)")
    db.execute("INSERT INTO frame_data VALUES (7, ?, 1)",
               (SENSOR_TYPE_CAMERA,))
    db.execute("INSERT INTO frame_data VALUES (7, ?, 3)",
               (SENSOR_TYPE_CAMERA,))
    db.execute("INSERT INTO frame_data VALUES (8, ?, 2)",
               (SENSOR_TYPE_CAMERA,))
    db.commit()
    db.close()


def test_golden_database_bytes(tmp_path):
    path = str(tmp_path / "golden.db")
    _golden_database(path)
    d = read_database(path)

    np.testing.assert_array_equal(d.camera_ids, [1, 2])
    np.testing.assert_array_equal(d.cam_model, [2, 1])
    np.testing.assert_allclose(d.cam_params[0], [900.0, 512.0, 384.0, 0.01])
    np.testing.assert_allclose(d.cam_params[1], [500.0, 510.0, 320.0, 240.0])
    np.testing.assert_array_equal(d.cam_prior_focal, [True, False])
    assert d.image_names == ["a.jpg", "b.jpg", "c.jpg"]
    # 6-col affine keypoints: x/y extracted from the first two columns
    np.testing.assert_allclose(d.kp_xy[:2], [[10, 20], [30, 40]])
    np.testing.assert_allclose(d.kp_xy[2:4], [[11, 21], [31, 41]])
    np.testing.assert_array_equal(d.kp_offset, [0, 2, 4, 5])

    assert len(d.tvg_pair_ids) == 1
    assert d.tvg_pair_ids[0] == 1 * MAX_IMAGE_ID + 2
    assert d.tvg_configs[0] == 2
    np.testing.assert_allclose(d.tvg_F[0].ravel(), np.arange(9))
    np.testing.assert_allclose(d.tvg_E[0].ravel(), np.arange(9, 18))
    np.testing.assert_allclose(d.tvg_H[0].ravel(), np.arange(18, 27))
    np.testing.assert_allclose(d.tvg_qvec[0], [0.5, 0.5, 0.5, 0.5])
    np.testing.assert_allclose(d.tvg_tvec[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(d.tvg_matches[0], [[0, 1], [1, 0]])

    # rig/frame ingestion against fixed bytes
    assert len(d.rigs) == 1
    rig_id, sensors = d.rigs[0]
    assert rig_id == 1
    sensors = sorted(sensors, key=lambda s: s[1])
    assert sensors[0][:2] == (SENSOR_TYPE_CAMERA, 1)
    assert sensors[0][2] is None  # reference sensor
    assert sensors[1][:2] == (SENSOR_TYPE_CAMERA, 2)
    np.testing.assert_allclose(sensors[1][2],
                               [0.0, 0.0, 1.0, 0.0, 0.1, 0.2, 0.3])
    assert d.frames == [(7, 1, [(SENSOR_TYPE_CAMERA, 1),
                                (SENSOR_TYPE_CAMERA, 3)]),
                        (8, 1, [(SENSOR_TYPE_CAMERA, 2)])]


def test_golden_database_full_ingestion(tmp_path):
    """The converter maps the golden database into a consistent Scene:
    rig poses, frame membership, canonical intrinsics."""
    from glomap_tpu.io.convert import database_to_scene

    path = str(tmp_path / "golden.db")
    _golden_database(path)
    scene, vg = database_to_scene(read_database(path))

    assert scene.num_cameras == 2
    assert scene.num_images == 3
    assert scene.num_frames == 2
    # canonical intrinsics: SIMPLE_RADIAL ties fx=fy, k1 in slot 4
    np.testing.assert_allclose(scene.cam_params[0, :5],
                               [900.0, 900.0, 512.0, 384.0, 0.01])
    assert scene.cam_has_prior_focal[0] and not scene.cam_has_prior_focal[1]
    # the non-reference sensor carries the golden sensor_from_rig pose
    nonref = ~scene.sensor_is_ref
    assert nonref.sum() == 1
    np.testing.assert_allclose(scene.sensor_quat[nonref][0], [0, 0, 1, 0])
    np.testing.assert_allclose(scene.sensor_trans[nonref][0],
                               [0.1, 0.2, 0.3])
    # images 1 and 3 share frame id 7
    f_of = {int(scene.image_ids[k]): int(scene.image_frame[k])
            for k in range(3)}
    assert f_of[1] == f_of[3] != f_of[2]
    # the two-view geometry row came through with pose and matches
    assert vg.num_pairs == 1
    np.testing.assert_allclose(vg.pair_quat[0], [0.5, 0.5, 0.5, 0.5])
    assert vg.num_matches == 2


def _pack_string(s):
    return s.encode() + b"\x00"


def test_golden_model_bytes(tmp_path):
    """Hand-packed cameras.bin / images.bin / points3D.bin (COLMAP binary
    format) parse correctly, and our writer reproduces the same content."""
    from glomap_tpu.io.colmap_model import read_model, write_model

    mdir = tmp_path / "model"
    mdir.mkdir()
    # cameras.bin: u64 count; per cam: i32 id, i32 model, u64 w, u64 h,
    # f64 params[num_params(model)]
    with open(mdir / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 2, 1024, 768))
        f.write(struct.pack("<4d", 900.0, 512.0, 384.0, 0.01))
    # images.bin: u64 count; per image: i32 id, 4d qvec (w,x,y,z), 3d tvec,
    # i32 camera_id, name\0, u64 n_pts2d, per pt: 2d xy, i64 point3D_id
    with open(mdir / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 5))
        f.write(struct.pack("<7d", 1.0, 0.0, 0.0, 0.0, 0.5, -0.5, 2.0))
        f.write(struct.pack("<i", 1))
        f.write(_pack_string("img5.jpg"))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 10.0, 20.0, 9))
        f.write(struct.pack("<ddq", 30.0, 40.0, -1))
    # points3D.bin: u64 count; per point: i64 id, 3d xyz, 3B rgb, d error,
    # u64 track_len, per el: i32 image_id, i32 point2D_idx
    with open(mdir / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<q", 9))
        f.write(struct.pack("<3d", 1.5, 2.5, 3.5))
        f.write(struct.pack("<3B", 10, 20, 30))
        f.write(struct.pack("<d", 0.25))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 5, 0))

    cams, imgs, pts = read_model(str(mdir))
    assert set(cams) == {1}
    model_id, w, h, params = cams[1]
    assert (model_id, w, h) == (2, 1024, 768)
    np.testing.assert_allclose(params, [900.0, 512.0, 384.0, 0.01])
    q, t, cam_id, name, pts2d, p3d = imgs[5]
    np.testing.assert_allclose(q, [1, 0, 0, 0])
    np.testing.assert_allclose(t, [0.5, -0.5, 2.0])
    assert cam_id == 1 and name == "img5.jpg"
    np.testing.assert_allclose(pts2d, [[10, 20], [30, 40]])
    np.testing.assert_array_equal(p3d, [9, -1])
    xyz, rgb, err, track = pts[9]
    np.testing.assert_allclose(xyz, [1.5, 2.5, 3.5])
    np.testing.assert_array_equal(rgb, [10, 20, 30])
    assert err == pytest.approx(0.25)
    assert list(track) == [(5, 0)]

    # writer round-trip reproduces identical content
    out = tmp_path / "rt"
    out.mkdir()
    write_model(str(out), cams, imgs, pts, binary=True)
    cams2, imgs2, pts2 = read_model(str(out))
    assert cams2.keys() == cams.keys() and imgs2.keys() == imgs.keys()
    np.testing.assert_allclose(imgs2[5][0], imgs[5][0])
    np.testing.assert_allclose(pts2[9][0], pts[9][0])
    assert list(pts2[9][3]) == [(5, 0)]

"""Database interop hardening: schema-variant and corrupted-bytes
tolerance of the SQLite reader + converter.

Mirrors the edge cases the reference converter survives
(glomap/io/colmap_converter.cc:213-427): pre-rig databases without
rig/frame tables (trivial rigs/frames auto-created, :311-343), pairs
whose two-view config is UNDEFINED/DEGENERATE/WATERMARK/MULTIPLE
(invalidated, :377-384), match rows with invalid or out-of-range feature
indices (dropped row-by-row, :414-424), image ids at the pair_id
encoding edge (pair_id = id1 * 2147483647 + id2), and zero-keypoint
images.
"""

import sqlite3

import numpy as np

from glomap_tpu.io.convert import database_to_scene
from glomap_tpu.io.database import (MAX_IMAGE_ID, pair_id_to_image_ids,
                                    read_database, write_database)
from glomap_tpu.scene.view_graph import (CONFIG_CALIBRATED,
                                         CONFIG_DEGENERATE, CONFIG_MULTIPLE,
                                         CONFIG_UNDEFINED, CONFIG_WATERMARK)
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _write_db(tmp_path, name="db.sqlite", **kw):
    scene, vg, gt = synthesize_dataset(SyntheticOptions(
        num_frames_per_rig=8, num_points3D=100, seed=40, **kw))
    path = str(tmp_path / name)
    write_database(path, scene, vg)
    return path, scene, vg


def test_pre_rig_database_without_rig_tables(tmp_path):
    """Old COLMAP schemas have no rigs/rig_sensors/frames/frame_data
    tables at all; ingestion must auto-create trivial rigs/frames."""
    path, scene, vg = _write_db(tmp_path)
    db = sqlite3.connect(path)
    for t in ("rigs", "rig_sensors", "frames", "frame_data"):
        db.execute(f"DROP TABLE IF EXISTS {t}")
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert scene2.num_frames == scene2.num_images
    assert len(scene2.sensor_quat) == scene2.num_images
    assert scene2.sensor_known.all()
    assert vg2.num_pairs == vg.num_pairs


def test_old_two_view_schema_without_pose_columns(tmp_path):
    """Pre-pose two_view_geometries schemas lack qvec/tvec columns."""
    path, scene, vg = _write_db(tmp_path, name="old.sqlite")
    db = sqlite3.connect(path)
    for col in ("qvec", "tvec"):
        db.execute(f"ALTER TABLE two_view_geometries DROP COLUMN {col}")
    db.commit()
    db.close()
    scene2, vg2 = database_to_scene(read_database(path))
    assert vg2.num_pairs == vg.num_pairs
    # identity placeholder poses
    np.testing.assert_array_equal(vg2.pair_quat[:, 0], 1.0)


def test_invalid_two_view_configs_mark_pairs_invalid(tmp_path):
    path, scene, vg = _write_db(tmp_path)
    db = sqlite3.connect(path)
    pair_ids = [r[0] for r in db.execute(
        "SELECT pair_id FROM two_view_geometries ORDER BY pair_id")]
    bad_cfgs = [CONFIG_UNDEFINED, CONFIG_DEGENERATE, CONFIG_WATERMARK,
                CONFIG_MULTIPLE]
    for pid, cfg in zip(pair_ids[:4], bad_cfgs):
        db.execute("UPDATE two_view_geometries SET config=? WHERE pair_id=?",
                   (int(cfg), int(pid)))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert vg2.num_pairs == vg.num_pairs
    assert int((~vg2.pair_valid).sum()) == 4
    # the valid ones keep their config
    assert (vg2.pair_config[vg2.pair_valid] == CONFIG_CALIBRATED).all()


def test_out_of_range_match_indices_dropped(tmp_path):
    path, scene, vg = _write_db(tmp_path)
    db = sqlite3.connect(path)
    pid, rows, cols, data = db.execute(
        "SELECT pair_id, rows, cols, data FROM two_view_geometries "
        "ORDER BY pair_id LIMIT 1").fetchone()
    m = np.frombuffer(data, np.uint32).reshape(rows, cols).copy()
    m[0, 0] = np.uint32(0xFFFFFFFF)       # kInvalidPoint2DIdx
    m[1, 1] = np.uint32(10 ** 6)          # past the keypoint count
    db.execute("UPDATE two_view_geometries SET data=? WHERE pair_id=?",
               (m.tobytes(), int(pid)))
    db.execute("UPDATE matches SET data=? WHERE pair_id=?",
               (m.tobytes(), int(pid)))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert vg2.num_matches == vg.num_matches - 2
    # every surviving index is in range for its image's keypoint slice
    kp_count = np.diff(scene2.kp_offset)
    assert (vg2.match_f1 < kp_count[vg2.pair_i[vg2.match_pair]]).all()
    assert (vg2.match_f2 < kp_count[vg2.pair_j[vg2.match_pair]]).all()


def test_pair_id_encoding_at_image_id_edge(tmp_path):
    """Image ids just below the 2^31-1 multiplier must round-trip through
    the pair_id encoding without overflow (int64 arithmetic)."""
    big1, big2 = MAX_IMAGE_ID - 2, MAX_IMAGE_ID - 1
    pid = big1 * MAX_IMAGE_ID + big2
    i1, i2 = pair_id_to_image_ids(pid)
    assert (int(i1), int(i2)) == (big1, big2)

    path, scene, vg = _write_db(tmp_path)
    db = sqlite3.connect(path)
    # remap two image ids (and their keypoints/pair rows) to the edge
    old1, old2 = int(scene.image_ids[0]), int(scene.image_ids[1])
    old_pid = min(old1, old2) * MAX_IMAGE_ID + max(old1, old2)
    row = db.execute("SELECT rows, cols, data, config, F, E, H, qvec, tvec"
                     " FROM two_view_geometries WHERE pair_id=?",
                     (old_pid,)).fetchone()
    assert row is not None
    for old, new in ((old1, big1), (old2, big2)):
        db.execute("UPDATE images SET image_id=? WHERE image_id=?",
                   (new, old))
        db.execute("UPDATE keypoints SET image_id=? WHERE image_id=?",
                   (new, old))
    # drop every stale pair row touching the remapped images, reinsert
    # the one edge pair under its new id
    for r in db.execute("SELECT pair_id FROM two_view_geometries").fetchall():
        a, b = pair_id_to_image_ids(r[0])
        if int(a) in (old1, old2) or int(b) in (old1, old2):
            db.execute("DELETE FROM two_view_geometries WHERE pair_id=?",
                       (int(r[0]),))
            db.execute("DELETE FROM matches WHERE pair_id=?", (int(r[0]),))
    db.execute("INSERT INTO two_view_geometries VALUES (?,?,?,?,?,?,?,?,?,?)",
               (pid, *row[:2], row[2], *row[3:]))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert big1 in scene2.image_ids and big2 in scene2.image_ids
    a = int(np.nonzero(scene2.image_ids == big1)[0][0])
    b = int(np.nonzero(scene2.image_ids == big2)[0][0])
    has_edge = ((vg2.pair_i == a) & (vg2.pair_j == b)).any()
    assert has_edge


def test_zero_keypoint_images(tmp_path):
    path, scene, vg = _write_db(tmp_path)
    db = sqlite3.connect(path)
    iid = int(scene.image_ids[0])
    db.execute("UPDATE keypoints SET rows=0, cols=2, data=NULL "
               "WHERE image_id=?", (iid,))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert int(scene2.kp_offset[1] - scene2.kp_offset[0]) == 0
    # all matches into the now-empty image were dropped as out-of-range
    img0 = 0  # image_ids sorted; iid was the first
    on_img0 = (vg2.pair_i[vg2.match_pair] == img0) | \
        (vg2.pair_j[vg2.match_pair] == img0)
    assert not on_img0.any()


def test_partial_rig_coverage_gets_trivial_rigs_and_frames(tmp_path):
    """Rig tables exist but one camera is in no rig and one image is in
    no frame: the converter must create trivial ones (reference
    colmap_converter.cc:313-343)."""
    path, scene, vg = _write_db(tmp_path, name="rig.sqlite",
                                num_cameras_per_rig=2)
    db = sqlite3.connect(path)
    # remove one camera's sensor row and one image's frame_data row
    cam0 = int(scene.camera_ids[0])
    img_last = int(scene.image_ids[-1])
    db.execute("DELETE FROM rig_sensors WHERE sensor_id=?", (cam0,))
    db.execute("DELETE FROM frame_data WHERE data_id=?", (img_last,))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    # every image has a frame and a sensor
    assert (scene2.image_frame >= 0).all()
    assert scene2.num_frames >= scene.num_frames
    assert len(scene2.sensor_quat) >= len(scene.sensor_quat)
    # the orphaned camera's sensor is a trivial reference sensor
    s = scene2.image_sensor[np.nonzero(
        scene2.camera_ids[scene2.image_camera] == cam0)[0]]
    assert scene2.sensor_is_ref[s].all()


def test_keypoints_with_affine_columns(tmp_path):
    """Real COLMAP writes keypoints with 4 (x, y, scale, orientation) or
    6 (affine frame) columns; only x, y are consumed
    (colmap_converter.cc:247-254)."""
    path, scene, vg = _write_db(tmp_path, name="affine.sqlite")
    db = sqlite3.connect(path)
    rng = np.random.default_rng(0)
    for iid, r, c, data in db.execute(
            "SELECT image_id, rows, cols, data FROM keypoints").fetchall():
        xy = np.frombuffer(data, np.float32).reshape(r, c)
        cols = 6 if iid % 2 == 0 else 4
        full = np.concatenate(
            [xy, rng.standard_normal((r, cols - 2)).astype(np.float32)],
            axis=1)
        db.execute("UPDATE keypoints SET cols=?, data=? WHERE image_id=?",
                   (cols, np.ascontiguousarray(full).tobytes(), iid))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert np.allclose(scene2.kp_xy, scene.kp_xy, atol=1e-5)
    assert vg2.num_matches == vg.num_matches


def test_legacy_images_table_with_prior_columns(tmp_path):
    """COLMAP <= 3.9 stored pose priors as columns of the images table;
    the reader must not depend on the exact column set."""
    path, scene, vg = _write_db(tmp_path, name="legacy.sqlite")
    db = sqlite3.connect(path)
    rows = db.execute(
        "SELECT image_id, name, camera_id FROM images").fetchall()
    db.execute("DROP TABLE images")
    db.execute(
        "CREATE TABLE images (image_id INTEGER PRIMARY KEY NOT NULL, "
        "name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL, "
        "prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL, "
        "prior_tx REAL, prior_ty REAL, prior_tz REAL)")
    for iid, name, cid in rows:
        db.execute(
            "INSERT INTO images VALUES (?, ?, ?, 1, 0, 0, 0, 0, 0, 0)",
            (iid, name, cid))
    db.commit()
    db.close()

    scene2, vg2 = database_to_scene(read_database(path))
    assert scene2.num_images == scene.num_images
    assert scene2.image_names == scene.image_names


def test_pose_priors_table_tolerated(tmp_path):
    """COLMAP >= 3.10 adds a pose_priors table (the reference leaves it
    as TODO, colmap_converter.cc:232-239); it must parse and not disturb
    ingestion."""
    path, scene, vg = _write_db(tmp_path, name="priors.sqlite")
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE pose_priors (image_id INTEGER PRIMARY KEY NOT NULL, "
        "position BLOB, coordinate_system INTEGER NOT NULL, "
        "position_covariance BLOB)")
    pos = np.asarray([1.0, 2.0, 3.0])
    cov = np.eye(3) * 0.5
    db.execute("INSERT INTO pose_priors VALUES (?, ?, ?, ?)",
               (int(scene.image_ids[0]), pos.tobytes(), 1, cov.tobytes()))
    # a row with a NULL position must be skipped, not crash
    db.execute("INSERT INTO pose_priors VALUES (?, NULL, 0, NULL)",
               (int(scene.image_ids[1]),))
    # descriptors presence must also be harmless
    db.execute("INSERT OR REPLACE INTO descriptors VALUES (?, ?, ?, ?)",
               (int(scene.image_ids[0]), 2, 128,
                np.zeros((2, 128), np.uint8).tobytes()))
    db.commit()
    db.close()

    data = read_database(path)
    assert set(data.pose_priors) == {int(scene.image_ids[0])}
    p, cs, c = data.pose_priors[int(scene.image_ids[0])]
    assert np.allclose(p, pos) and cs == 1 and np.allclose(c, cov)
    scene2, vg2 = database_to_scene(data)
    assert scene2.num_images == scene.num_images
    assert vg2.num_pairs == vg.num_pairs


def test_pose_priors_without_covariance_column(tmp_path):
    """Early 3.10 schemas lack position_covariance."""
    path, scene, vg = _write_db(tmp_path, name="priors2.sqlite")
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE pose_priors (image_id INTEGER PRIMARY KEY NOT NULL, "
        "position BLOB, coordinate_system INTEGER NOT NULL)")
    db.execute("INSERT INTO pose_priors VALUES (?, ?, ?)",
               (int(scene.image_ids[2]),
                np.asarray([4.0, 5.0, 6.0]).tobytes(), 0))
    db.commit()
    db.close()
    data = read_database(path)
    p, cs, c = data.pose_priors[int(scene.image_ids[2])]
    assert np.allclose(p, [4.0, 5.0, 6.0]) and cs == 0 and c is None

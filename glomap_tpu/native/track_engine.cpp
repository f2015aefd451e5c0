// Native host-side track engine: union-find concatenation + greedy
// coverage selection.
//
// TPU-native framework counterpart of the reference's C++ track engine
// (glomap/controllers/track_establishment.cc + colmap UnionFind): the
// memory-heavy O(total matches) passes stay native on the host, operating
// on dense global keypoint indices (kp_offset[image] + feature) instead of
// (image_id << 32 | feature_id) hash keys, so no hashing is needed at all.
// Exposed via ctypes (see glomap_tpu/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

// Path-halving find on a flat parent array.
inline int64_t find_root(int64_t* parent, int64_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

}  // namespace

extern "C" {

// Union-find over [0, num_kp) joined by match edges; writes a contiguous
// track id per keypoint into track_id_out (-1 for keypoints in no match).
// Returns the number of tracks (connected components with >= 2 members).
int64_t glomap_establish_tracks(int64_t num_kp, int64_t num_matches,
                                const int64_t* kp1, const int64_t* kp2,
                                int64_t* track_id_out) {
  std::vector<int64_t> parent(num_kp);
  std::iota(parent.begin(), parent.end(), 0);

  for (int64_t m = 0; m < num_matches; ++m) {
    int64_t a = find_root(parent.data(), kp1[m]);
    int64_t b = find_root(parent.data(), kp2[m]);
    if (a == b) continue;
    // smaller index becomes root (deterministic, mirrors the reference's
    // smallest-key-as-root union)
    if (a < b)
      parent[b] = a;
    else
      parent[a] = b;
  }

  // mark roots that appear in at least one match
  std::vector<uint8_t> touched(num_kp, 0);
  for (int64_t m = 0; m < num_matches; ++m) {
    touched[find_root(parent.data(), kp1[m])] = 1;
    touched[find_root(parent.data(), kp2[m])] = 1;
  }

  std::vector<int64_t> root_to_track(num_kp, -1);
  int64_t num_tracks = 0;
  for (int64_t i = 0; i < num_kp; ++i) {
    if (parent[i] == i && touched[i]) root_to_track[i] = num_tracks++;
  }
  for (int64_t i = 0; i < num_kp; ++i) {
    int64_t r = find_root(parent.data(), i);
    track_id_out[i] = root_to_track[r];
  }
  return num_tracks;
}

// Greedy coverage selection (reference FindTracksForProblem semantics):
// tracks sorted longest-first; a track is selected if any of its images
// still needs tracks (counter <= min_tracks_per_view); selection stops
// when every image is covered or max_num_tracks is reached.
// min_tracks_per_view < 0 reproduces the reference's unsigned-compare
// behavior: every eligible track is selected (up to max_num_tracks).
//
// Inputs: per-obs track id and image id (obs of ineligible tracks may be
// included; they are skipped via track_eligible). track_num_images must
// hold the number of DISTINCT images per track.
// Output: selected[t] in {0,1}. Returns number selected.
int64_t glomap_select_tracks(int64_t num_tracks, int64_t num_obs,
                             const int64_t* obs_track, const int64_t* obs_image,
                             const uint8_t* track_eligible,
                             const int64_t* track_num_images,
                             int64_t num_images, int64_t min_tracks_per_view,
                             int64_t max_num_tracks, uint8_t* selected) {
  // bucket observations by track (CSR)
  std::vector<int64_t> offsets(num_tracks + 1, 0);
  for (int64_t o = 0; o < num_obs; ++o) offsets[obs_track[o] + 1]++;
  for (int64_t t = 0; t < num_tracks; ++t) offsets[t + 1] += offsets[t];
  std::vector<int64_t> obs_by_track(num_obs);
  {
    std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
    for (int64_t o = 0; o < num_obs; ++o)
      obs_by_track[cursor[obs_track[o]]++] = o;
  }

  // order tracks by (num_images desc, track id desc) — mirrors the
  // reference's reverse sort of (length, id) pairs
  std::vector<int64_t> order(num_tracks);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (track_num_images[a] != track_num_images[b])
      return track_num_images[a] > track_num_images[b];
    return a > b;
  });

  std::vector<int64_t> per_image(num_images, 0);
  int64_t images_left = num_images;
  int64_t num_selected = 0;

  for (int64_t k = 0; k < num_tracks; ++k) {
    int64_t t = order[k];
    if (!track_eligible[t]) continue;
    bool added = false;
    for (int64_t p = offsets[t]; p < offsets[t + 1]; ++p) {
      int64_t img = obs_image[obs_by_track[p]];
      if (min_tracks_per_view >= 0 && per_image[img] > min_tracks_per_view)
        continue;
      per_image[img]++;
      if (min_tracks_per_view >= 0 && per_image[img] > min_tracks_per_view)
        images_left--;
      if (!added) {
        selected[t] = 1;
        added = true;
        num_selected++;
      }
    }
    if (min_tracks_per_view >= 0 && images_left <= 0) break;
    if (num_selected > max_num_tracks) break;
  }
  return num_selected;
}

// Connected components over an edge list (used for view-graph components
// and strong-cluster analysis). Writes component label per node.
int64_t glomap_connected_components(int64_t num_nodes, int64_t num_edges,
                                    const int64_t* ei, const int64_t* ej,
                                    int64_t* label_out) {
  std::vector<int64_t> parent(num_nodes);
  std::iota(parent.begin(), parent.end(), 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    int64_t a = find_root(parent.data(), ei[e]);
    int64_t b = find_root(parent.data(), ej[e]);
    if (a == b) continue;
    if (a < b)
      parent[b] = a;
    else
      parent[a] = b;
  }
  std::vector<int64_t> root_to_label(num_nodes, -1);
  int64_t n_comp = 0;
  for (int64_t i = 0; i < num_nodes; ++i) {
    int64_t r = find_root(parent.data(), i);
    if (root_to_label[r] < 0) root_to_label[r] = n_comp++;
    label_out[i] = root_to_label[r];
  }
  return n_comp;
}

}  // extern "C"

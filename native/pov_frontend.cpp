// pov_frontend.cpp — bulk-export C ABI of the native host front-end.
//
// See pov_core.h for the decode core; pov_capi.cpp implements the
// reference-compatible Callbacks.h C ABI + ogg_vorbis_full_read*.

#include "pov_core.h"

// ------------------------------------------------------------------ C ABI --

extern "C" {

struct PovHandle {
  pov::ParsedFile pf;
};

// Parse a whole in-memory ogg; returns handle or nullptr (error via
// pov_last_error-style out parameter).
PovHandle* pov_parse(const uint8_t* data, size_t len, char* err_out,
                     size_t err_cap) {
  auto* h = new PovHandle();
  try {
    pov::parse_file(h->pf, data, len);
    return h;
  } catch (const pov::ParseError& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.msg.c_str(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    delete h;
    return nullptr;
  } catch (const std::exception& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.what(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    delete h;
    return nullptr;
  }
}

void pov_free(PovHandle* h) { delete h; }

// ------------------------------------------------- incremental front-end --
//
// Bounded-memory parse of long streams: pov_inc_open parses up to the
// first Vorbis stream's setup, then pov_inc_next fills a window of up to
// max_frames frames (plus one carried context frame after the first
// window — its windowed samples seed the next chunk's overlap-add) into a
// view PovHandle that all the bulk exporters accept unchanged.  Host
// memory is O(window), matching the reference's O(blocksize) streaming
// posture (ParseOggVorbis.hpp:995-1006) at batch-tensor granularity.
// The caller must keep `data` alive for the handle's lifetime.

struct PovIncHandle {
  pov::MultiParser mp;
  PovHandle view;        // exporters read the current window through this
  bool carry_valid = false;
  pov::Frame carry;      // last frame of the previous window (context)
  bool opened = false;
};

static pov::StreamAccum* inc_target(PovIncHandle* h) {
  if (h->mp.first_vorbis < 0) return nullptr;
  return &h->mp.accums[h->mp.first_vorbis];
}

PovIncHandle* pov_inc_open(const uint8_t* data, size_t len, char* err_out,
                           size_t err_cap) {
  auto* h = new PovIncHandle();
  h->mp.data = data;
  h->mp.len = len;
  h->mp.only_first_vorbis = true;
  try {
    // parse until the first Vorbis stream's setup is complete
    while (true) {
      pov::StreamAccum* sa = inc_target(h);
      if (sa && sa->packet_count >= 3) break;
      if (!h->mp.step()) break;
    }
    pov::StreamAccum* sa = inc_target(h);
    POV_CHECK(sa != nullptr, "no vorbis stream found");
    POV_CHECK(sa->packet_count >= 3, "no setup packet found");
    // one-time copy of the stream metadata + setup into the view
    h->view.pf.sample_rate = sa->pf.sample_rate;
    h->view.pf.channels = sa->pf.channels;
    h->view.pf.blocksize0 = sa->pf.blocksize0;
    h->view.pf.blocksize1 = sa->pf.blocksize1;
    h->view.pf.setup = sa->pf.setup;
    h->opened = true;
    return h;
  } catch (const pov::ParseError& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.msg.c_str(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    delete h;
    return nullptr;
  } catch (const std::exception& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.what(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    delete h;
    return nullptr;
  }
}

// Fill the next window.  Returns the number of frames in the view
// (including the leading context frame after the first window), 0 at end
// of stream, or -1 on parse error.
int64_t pov_inc_next(PovIncHandle* h, int64_t max_frames, char* err_out,
                     size_t err_cap) {
  try {
    pov::StreamAccum* sa = inc_target(h);
    while ((int64_t)sa->pf.frames.size() < max_frames && h->mp.step()) {
    }
    std::vector<pov::Frame>& fresh = sa->pf.frames;
    if (fresh.empty()) {
      h->view.pf.frames.clear();
      return 0;
    }
    std::vector<pov::Frame> window;
    window.reserve(fresh.size() + 1);
    if (h->carry_valid) window.emplace_back(std::move(h->carry));
    for (auto& f : fresh) window.emplace_back(std::move(f));
    fresh.clear();
    h->carry = window.back();  // copy: next window's context
    h->carry_valid = true;
    h->view.pf.frames = std::move(window);
    return (int64_t)h->view.pf.frames.size();
  } catch (const pov::ParseError& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.msg.c_str(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    return -1;
  } catch (const std::exception& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.what(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    return -1;
  }
}

// The window view for the bulk exporters (owned by the inc handle; do NOT
// pov_free it).
PovHandle* pov_inc_view(PovIncHandle* h) { return &h->view; }

void pov_inc_free(PovIncHandle* h) { delete h; }

// Full demux: one handle per logical stream (chained/multiplexed files),
// in BOS order.  Returns the stream count (fills up to max_out handles),
// or -1 on parse error (message in err_out).
// flags bit 0: floors-only parse — residue symbols are decoded (bit
// position) but discarded, floor curve render skipped; the handle serves
// the floor-ys/flags/metadata exporters only (pov_export_frames/residues/
// env/curves_full zero-fill and must not be used — the Python front-end
// guards).  The pure floor feature kinds' parse is ~2x cheaper this way.
int32_t pov_parse_multi_opts(const uint8_t* data, size_t len, int32_t flags,
                             PovHandle** out, int32_t max_out, char* err_out,
                             size_t err_cap) {
  try {
    std::vector<pov::ParsedFile> parsed;
    pov::parse_file_multi(parsed, data, len, (flags & 1) != 0);
    int32_t count = (int32_t)parsed.size();
    for (int32_t i = 0; i < count && i < max_out; ++i) {
      auto* h = new PovHandle();
      h->pf = std::move(parsed[i]);
      out[i] = h;
    }
    return count;
  } catch (const pov::ParseError& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.msg.c_str(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    return -1;
  } catch (const std::exception& e) {
    if (err_out && err_cap) {
      strncpy(err_out, e.what(), err_cap - 1);
      err_out[err_cap - 1] = 0;
    }
    return -1;
  }
}

int32_t pov_parse_multi(const uint8_t* data, size_t len, PovHandle** out,
                        int32_t max_out, char* err_out, size_t err_cap) {
  return pov_parse_multi_opts(data, len, 0, out, max_out, err_out, err_cap);
}

// 1 when the handle came from a floors-only parse (curve/residue/env
// exports unavailable).
int32_t pov_is_floors_only(PovHandle* h) { return h->pf.floors_only ? 1 : 0; }

void pov_info(PovHandle* h, uint32_t* sample_rate, int32_t* channels,
              int32_t* blocksize0, int32_t* blocksize1, int64_t* num_frames,
              int32_t* num_modes) {
  *sample_rate = h->pf.sample_rate;
  *channels = h->pf.channels;
  *blocksize0 = h->pf.blocksize0;
  *blocksize1 = h->pf.blocksize1;
  *num_frames = (int64_t)h->pf.frames.size();
  *num_modes = (int32_t)h->pf.setup.modes.size();
}

// Per-mode info: block_flag and coupling list of its mapping.
int32_t pov_mode_info(PovHandle* h, int32_t mode_idx, int32_t* block_flag,
                      int32_t* couplings /* [2*max] mag,ang pairs */,
                      int32_t max_couplings) {
  const pov::Mode& m = h->pf.setup.modes[mode_idx];
  const pov::Mapping& mp = h->pf.setup.mappings[m.mapping];
  *block_flag = m.block_flag ? 1 : 0;
  int count = (int)mp.couplings.size();
  for (int i = 0; i < count && i < max_couplings; ++i) {
    couplings[2 * i] = mp.couplings[i].first;
    couplings[2 * i + 1] = mp.couplings[i].second;
  }
  return count;
}

// Frame metadata arrays, each of length num_frames.
void pov_frame_meta(PovHandle* h, int32_t* mode_idx, int32_t* win_sel,
                    int32_t* n, int64_t* granule) {
  for (size_t t = 0; t < h->pf.frames.size(); ++t) {
    const pov::Frame& f = h->pf.frames[t];
    mode_idx[t] = f.mode_idx;
    win_sel[t] = f.win_sel;
    n[t] = f.n;
    granule[t] = f.granule;
  }
}

// Bulk export of frame tensors for a list of frame indices sharing blocksize
// n: curve -> [B, C, n/2] u8, flags -> [B, C] u8 each, residue [B, C, n/2] f32.
void pov_export_frames(PovHandle* h, const int64_t* frame_ids, int64_t count,
                       uint8_t* curve, uint8_t* decoded, uint8_t* used,
                       float* residue) {
  int C = h->pf.channels;
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    size_t n = (size_t)f.n;
    size_t half = n / 2;
    if (f.curve.empty()) {  // floors-only handle misuse: zero, don't read OOB
      memset(curve + (size_t)i * C * half, 0, (size_t)C * half);
      memset(residue + (size_t)i * C * half, 0, sizeof(float) * C * half);
    } else {
      for (int ch = 0; ch < C; ++ch)
        memcpy(curve + ((size_t)i * C + ch) * half, f.curve.data() + ch * n,
               half);
      memcpy(residue + (size_t)i * C * half, f.residue.data(),
             sizeof(float) * C * half);
    }
    memcpy(decoded + (size_t)i * C, f.decoded.data(), C);
    memcpy(used + (size_t)i * C, f.used.data(), C);
  }
}

// Floor decode flags only: decoded/used -> [B, C] u8 each.  The device
// feature path needs row-emission masks without paying for the curve and
// residue copies of pov_export_frames.
void pov_export_flags(PovHandle* h, const int64_t* frame_ids, int64_t count,
                      uint8_t* decoded, uint8_t* used) {
  int C = h->pf.channels;
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    memcpy(decoded + (size_t)i * C, f.decoded.data(), C);
    memcpy(used + (size_t)i * C, f.used.data(), C);
  }
}

// Residue spectra only, for a channel range [ch0, ch1): [B, ch1-ch0, n/2]
// f32.  The concat-residue feature kind consumes channel 0 only.
void pov_export_residues(PovHandle* h, const int64_t* frame_ids, int64_t count,
                         int32_t ch0, int32_t ch1, float* residue) {
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    size_t half = (size_t)f.n / 2;
    if (f.residue.empty()) {  // floors-only handle misuse
      memset(residue + (size_t)i * (ch1 - ch0) * half, 0,
             sizeof(float) * (ch1 - ch0) * half);
      continue;
    }
    for (int32_t ch = ch0; ch < ch1; ++ch)
      memcpy(residue + ((size_t)i * (ch1 - ch0) + (ch - ch0)) * half,
             f.residue.data() + (size_t)ch * half, sizeof(float) * half);
  }
}

// Float32 envelopes for floor0 (LSP) modes: [B, C, n/2].  Frames with a
// floor0-bearing mapping carry a complete fenv (floor1 channels' inverse-dB
// envelopes are filled at parse time, pov_core.h parse_audio_packet); the
// else branch serves floor1-only frames of mixed-mode streams.
void pov_export_env(PovHandle* h, const int64_t* frame_ids, int64_t count,
                    float* env) {
  int C = h->pf.channels;
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    size_t half = (size_t)f.n / 2;
    if (f.curve.empty() && f.fenv.empty()) {  // floors-only handle misuse
      memset(env + (size_t)i * C * half, 0, sizeof(float) * C * half);
    } else if (!f.fenv.empty()) {
      memcpy(env + (size_t)i * C * half, f.fenv.data(),
             sizeof(float) * C * half);
    } else {
      for (int ch = 0; ch < C; ++ch)
        for (size_t k = 0; k < half; ++k)
          env[((size_t)i * C + ch) * half + k] =
              f.decoded[(size_t)ch]
                  ? pov::inverse_db(f.curve[(size_t)ch * f.n + k])
                  : 0.f;
    }
  }
}

// Full-window curves for the feature-extraction path: [B, C, n] u8.
void pov_export_curves_full(PovHandle* h, const int64_t* frame_ids,
                            int64_t count, uint8_t* curve) {
  int C = h->pf.channels;
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    if (f.curve.empty())  // floors-only handle misuse
      memset(curve + (size_t)i * C * f.n, 0, (size_t)C * f.n);
    else
      memcpy(curve + (size_t)i * C * f.n, f.curve.data(), (size_t)C * f.n);
  }
}

// Concatenated per-channel final_ys: [B, total_pts(mode)] u8.
void pov_export_floor_ys(PovHandle* h, const int64_t* frame_ids, int64_t count,
                         uint8_t* ys, int64_t total_pts) {
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    if ((int64_t)f.final_ys.size() == total_pts)
      memcpy(ys + (size_t)i * total_pts, f.final_ys.data(), total_pts);
  }
}

// final_ys + step2 flags (same layout): [B, total_pts] u8 each.
void pov_export_floor_ys_flags(PovHandle* h, const int64_t* frame_ids,
                               int64_t count, uint8_t* ys, uint8_t* flags,
                               int64_t total_pts) {
  for (int64_t i = 0; i < count; ++i) {
    const pov::Frame& f = h->pf.frames[frame_ids[i]];
    if ((int64_t)f.final_ys.size() == total_pts) {
      memcpy(ys + (size_t)i * total_pts, f.final_ys.data(), total_pts);
      memcpy(flags + (size_t)i * total_pts, f.ys_flags.data(), total_pts);
    }
  }
}

int32_t pov_num_floors(PovHandle* h) {
  return (int32_t)h->pf.setup.floors.size();
}

// Floor-1 config: returns num_points (0 for floor0 slots); fills multiplier
// and up to max_xs xs values.
int32_t pov_floor1_info(PovHandle* h, int32_t floor_idx, int32_t* multiplier,
                        uint32_t* xs, int32_t max_xs) {
  if (h->pf.setup.floor_types[floor_idx] != 1) return 0;
  const pov::Floor1& f = h->pf.setup.floors[floor_idx];
  *multiplier = f.multiplier;
  int npts = (int)f.xs.size();
  for (int i = 0; i < npts && i < max_xs; ++i) xs[i] = f.xs[i];
  return npts;
}

// Per-channel floor numbers for a mode's mapping: fills [C].
void pov_mode_floor_numbers(PovHandle* h, int32_t mode_idx, int32_t* floors) {
  const pov::Mode& m = h->pf.setup.modes[mode_idx];
  const pov::Mapping& mp = h->pf.setup.mappings[m.mapping];
  for (int ch = 0; ch < h->pf.channels; ++ch)
    floors[ch] = mp.submaps[mp.muxs[ch]].floor;
}

// --------------------------------------------------------------- factorize --
//
// Hash-based lossless factorization of a float32 array: each element's rank
// in the sorted distinct-value list (codes) plus that list itself (uniq).
// Replaces numpy's sort-based unique+searchsorted on the residue-compaction
// host path (device_decoder._encode_residue) at O(n) instead of O(n log n)
// — the residue arrays reach millions of elements per stream and their
// dictionary build was the dominant host cost of corpus decode.
//
// Semantics match the numpy pair it replaces: -0.0f collapses into +0.0f
// (numpy's unique also keeps a single representative of the pair; only the
// sign bit of the stored representative was unspecified there), and NaN
// payload patterns are kept distinct and sort last.  Returns the number of
// distinct values, writing them sorted to uniq_out and each element's rank
// to codes_out (uint16 — callers cap at 65536), or -1 if more than uniq_cap
// distinct values exist (codes_out/uniq_out contents are then undefined).

int64_t pov_factorize_f32(const float* data, int64_t n, float* uniq_out,
                          int64_t uniq_cap, uint16_t* codes_out) {
  if (n <= 0) return 0;
  if (uniq_cap <= 0 || uniq_cap > 65536) return -1;
  // Open-addressing table: id == -1 marks an empty slot (ids are ranks into
  // `vals`, never negative), so any key bit pattern is permitted.
  struct Slot { uint32_t key; int32_t id; };
  int64_t want = std::min<int64_t>(4 * uniq_cap, 2 * n);
  size_t tsize = 16;
  while ((int64_t)tsize < want) tsize <<= 1;
  std::vector<Slot> table(tsize, Slot{0, -1});
  const size_t mask = tsize - 1;
  std::vector<float> vals;
  vals.reserve(std::min<int64_t>(uniq_cap, n));
  std::vector<int32_t> prov(n >= 0 ? (size_t)n : 0);
  const uint32_t* bits = reinterpret_cast<const uint32_t*>(data);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t k = bits[i];
    if ((k & 0x7fffffffu) == 0) k = 0;  // -0.0f -> +0.0f
    // 32-bit finalizer-style hash
    uint32_t hv = k;
    hv ^= hv >> 16; hv *= 0x7feb352du;
    hv ^= hv >> 15; hv *= 0x846ca68bu;
    hv ^= hv >> 16;
    size_t pos = hv & mask;
    for (;;) {
      Slot& s = table[pos];
      if (s.id < 0) {
        if ((int64_t)vals.size() >= uniq_cap) return -1;
        s.key = k;
        s.id = (int32_t)vals.size();
        float v;
        memcpy(&v, &k, 4);
        vals.push_back(v);
        prov[i] = s.id;
        break;
      }
      if (s.key == k) {
        prov[i] = s.id;
        break;
      }
      pos = (pos + 1) & mask;
    }
  }
  const int64_t nu = (int64_t)vals.size();
  // rank the provisional ids by value (NaNs last, ordered by bit pattern
  // for determinism; numpy leaves the order among NaNs unspecified)
  std::vector<int32_t> order((size_t)nu);
  for (int64_t i = 0; i < nu; ++i) order[i] = (int32_t)i;
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    float va = vals[a], vb = vals[b];
    bool na = std::isnan(va), nb = std::isnan(vb);
    if (na != nb) return nb;
    if (na) {
      uint32_t ba, bb;
      memcpy(&ba, &va, 4);
      memcpy(&bb, &vb, 4);
      return ba < bb;
    }
    return va < vb;
  });
  std::vector<uint16_t> rank((size_t)nu);
  for (int64_t r = 0; r < nu; ++r) {
    uniq_out[r] = vals[order[r]];
    rank[order[r]] = (uint16_t)r;
  }
  for (int64_t i = 0; i < n; ++i) codes_out[i] = rank[prov[i]];
  return nu;
}

}  // extern "C"

// pov_capi.cpp — reference-compatible C ABI: debug callbacks + full decode.
//
// Implements, natively, the two C surfaces of the reference
// (/root/reference/src/Callbacks.h and ParseOggVorbis.hpp:1488-1494):
//
//  * the debug-callback subsystem: decoder registry with aliases,
//    thread-local pending sink/filter configuration, null/stdout/file sinks,
//    and the length-prefixed binary dump format — byte-compatible with the
//    reference so existing consumers (demo_live_extract.py via cffi,
//    compare-debug-out.py) work against this library unchanged;
//  * ogg_vorbis_full_read / ogg_vorbis_full_read_from_memory: a complete
//    scalar decode (floors, residues, coupling, IMDCT, window, overlap-add)
//    pushing the same taps in the same order as the reference decoder;
//  * the public C++ consumer API (pov.hpp): pov::OggReader::full_read
//    driving a pov::ParseCallbacks subclass — the same-language
//    equivalent of the reference's embeddable surface
//    (ParseOggVorbis.hpp:966-973, 1385-1485), layered on the same
//    ScalarStream pipeline as the two C faces.
//
// The IMDCT here is the direct transform evaluated with an exact-phase
// double cosine table (m = (2k+1)(2j+1+n/2) mod 4n advances incrementally),
// accumulated in double — O(n^2/4) but this surface is the debugging /
// feature-extraction channel, not the TPU fast path.

#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <vector>

#include "pov.hpp"
#include "pov_core.h"

// ------------------------------------------------------- callbacks C ABI --

namespace povcb {

enum OutputType { OT_null, OT_short_stdout, OT_file };

thread_local OutputType g_pending_output = OT_null;
thread_local std::string g_pending_filename;
thread_local bool g_pending_use_filter = false;
thread_local std::set<std::string> g_pending_filter;

std::mutex g_mutex;
int g_unique_idx = 1;

struct Info {
  int idx = 0;
  std::string name;
  const void* ref = nullptr;
  std::set<const void*> aliases;
  long sample_rate = 0;
  int num_channels = 0;
  OutputType output_type = OT_null;
  FILE* file = nullptr;
  bool use_filter = false;
  std::set<std::string> filter;

  ~Info() {
    if (file) fclose(file);
  }

  void raw_write(const void* data, uint32_t len) {
    fwrite(&len, sizeof(len), 1, file);
    fwrite(data, 1, len, file);
  }
  void raw_write(const std::string& s) { raw_write(s.data(), (uint32_t)s.size()); }

  void write_typed(const std::string& key, uint8_t type_id, uint8_t elem_size,
                   const void* data, uint32_t byte_len) {
    raw_write(key);
    raw_write(&type_id, 1);
    raw_write(&elem_size, 1);
    raw_write(data, byte_len);
  }

  void open_output(OutputType ot, const std::string& fn) {
    output_type = ot;
    if (ot != OT_file) return;
    file = fopen(fn.c_str(), "wb");
    if (!file) {
      fprintf(stderr, "pov callbacks: could not open %s\n", fn.c_str());
      output_type = OT_null;
      return;
    }
    raw_write(std::string("ParseOggVorbis-header-v1"));
    write_typed("decoder-name", 4, 1, name.data(), (uint32_t)name.size());
    uint32_t sr = (uint32_t)sample_rate;
    write_typed("decoder-sample-rate", 3, 4, &sr, 4);
    uint8_t ch = (uint8_t)num_channels;
    write_typed("decoder-num-channels", 4, 1, &ch, 1);
  }
};

std::map<const void*, Info> g_decoders;
std::map<const void*, const void*> g_alias_map;
// lock-free tap fast paths: when nothing is registered (the PCM consumer
// route never registers), every push_data returns before g_mutex —
// otherwise 8 decode threads serialize on one global lock per tap.
// g_active_count additionally counts decoders whose sink is not OT_null:
// a decoder's output config is fixed at registration (the thread-local
// pending config is consumed there) and filters only ever reduce output,
// so active==0 proves every push is a drop — the no-dump CLI/full_read
// case pays one relaxed load per tap instead of a locked map lookup
// (~350k locked lookups per 64 s mono stream before this).
std::atomic<int> g_decoder_count{0};
std::atomic<int> g_active_count{0};

// true iff some registered decoder has a live sink — callers may use it
// to skip tap-STAGING work (e.g. u32 conversion copies); push_data itself
// re-checks, so skipping is purely an optimization
inline bool taps_active() {
  return g_decoder_count.load(std::memory_order_relaxed) != 0 &&
         g_active_count.load(std::memory_order_relaxed) != 0;
}

Info* get_decoder(const void* ref) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto a = g_alias_map.find(ref);
  if (a != g_alias_map.end()) ref = a->second;
  auto it = g_decoders.find(ref);
  return it == g_decoders.end() ? nullptr : &it->second;
}

template <typename T>
void push_data(const void* ref, const char* name, int channel, const T* data,
               size_t len, uint8_t type_id, const char* kindname) {
  if (g_decoder_count.load(std::memory_order_relaxed) == 0) return;
  if (g_active_count.load(std::memory_order_relaxed) == 0) return;
  Info* info = get_decoder(ref);
  if (!info) return;
  if (info->use_filter && !info->filter.count(name)) return;
  if (info->output_type == OT_null) return;
  if (info->output_type == OT_short_stdout) {
    printf("decoder=%d '%s' name='%s' channel=%d", info->idx,
           info->name.c_str(), name, channel);
    if (!data) {
      printf(" data=NULL\n");
    } else {
      printf(" data=%s{", kindname);
      for (size_t i = 0; i < len && i < 10; ++i) {
        if (i) printf(" ");
        double v = (double)data[i];
        if (type_id == 1) printf("%g", v); else printf("%lld", (long long)data[i]);
      }
      if (len > 10) printf(" ...");
      printf("} len=%zu\n", len);
    }
    return;
  }
  info->write_typed("entry-name", 4, 1, name, (uint32_t)strlen(name));
  if (channel >= 0) {
    uint8_t ch = (uint8_t)channel;
    info->write_typed("entry-channel", 4, 1, &ch, 1);
  }
  info->write_typed("entry-data", type_id, sizeof(T), data,
                    (uint32_t)(len * sizeof(T)));
}

}  // namespace povcb

extern "C" {

void register_decoder_ref(const void* ref, const char* decoder_name,
                          long sample_rate, int num_channels) {
  using namespace povcb;
  std::lock_guard<std::mutex> lock(g_mutex);
  Info& info = g_decoders[ref];
  g_decoder_count.store((int)g_decoders.size(), std::memory_order_relaxed);
  if (!info.idx) info.idx = g_unique_idx++;
  info.ref = ref;
  info.name = decoder_name;
  info.sample_rate = sample_rate;
  info.num_channels = num_channels;
  info.open_output(g_pending_output, g_pending_filename);
  info.use_filter = g_pending_use_filter;
  info.filter.swap(g_pending_filter);
  g_pending_use_filter = false;
  g_pending_output = OT_null;
  int active = 0;
  for (auto& kv : g_decoders)
    if (kv.second.output_type != OT_null) ++active;
  g_active_count.store(active, std::memory_order_relaxed);
}

void register_decoder_alias(const void* orig_ref, const void* alias_ref) {
  using namespace povcb;
  std::lock_guard<std::mutex> lock(g_mutex);
  auto a = g_alias_map.find(orig_ref);
  const void* root = a != g_alias_map.end() ? a->second : orig_ref;
  auto it = g_decoders.find(root);
  if (it == g_decoders.end()) return;
  it->second.aliases.insert(alias_ref);
  g_alias_map[alias_ref] = root;
}

void unregister_decoder_ref(const void* ref) {
  using namespace povcb;
  std::lock_guard<std::mutex> lock(g_mutex);
  auto a = g_alias_map.find(ref);
  const void* root = a != g_alias_map.end() ? a->second : ref;
  auto it = g_decoders.find(root);
  if (it == g_decoders.end()) return;
  for (const void* al : it->second.aliases) g_alias_map.erase(al);
  g_decoders.erase(it);
  g_decoder_count.store((int)g_decoders.size(), std::memory_order_relaxed);
  int active = 0;
  for (auto& kv : g_decoders)
    if (kv.second.output_type != OT_null) ++active;
  g_active_count.store(active, std::memory_order_relaxed);
}

void set_data_output_null(void) { povcb::g_pending_output = povcb::OT_null; }
void set_data_output_short_stdout(void) {
  povcb::g_pending_output = povcb::OT_short_stdout;
}
void set_data_output_file(const char* fn) {
  povcb::g_pending_output = povcb::OT_file;
  povcb::g_pending_filename = fn;
}

void set_data_filter(const char** allowed_names) {
  using namespace povcb;
  g_pending_filter.clear();
  if (!allowed_names) {
    g_pending_use_filter = false;
    return;
  }
  g_pending_use_filter = true;
  for (const char** p = allowed_names; *p; ++p) g_pending_filter.insert(*p);
}

void push_data_float(const void* ref, const char* name, int channel,
                     const float* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 1, "f32");
}
void push_data_i32(const void* ref, const char* name, int channel,
                   const int32_t* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 2, "i32");
}
void push_data_u32(const void* ref, const char* name, int channel,
                   const uint32_t* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 3, "u32");
}
void push_data_u8(const void* ref, const char* name, int channel,
                  const uint8_t* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 4, "u8");
}
void push_data_i64(const void* ref, const char* name, int channel,
                   const int64_t* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 6, "i64");
}
void push_data_u64(const void* ref, const char* name, int channel,
                   const uint64_t* data, size_t len) {
  povcb::push_data(ref, name, channel, data, len, 7, "u64");
}
void push_data_int(const void* ref, const char* name, int channel,
                   const int* data, size_t len) {
  povcb::push_data(ref, name, channel, (const int32_t*)data, len, 2, "i32");
}

const char* generic_itoa(uint32_t val, int base, int len) {
  // utility kept for C-ABI parity with the reference (Callbacks.h:79);
  // clamp caller-supplied len/base so hostile values cannot write below
  // the buffer or read past the digit table
  static const char rep[] = "0123456789abcdef";
  static thread_local char buf[33];
  if (len < 0 || len > 32) len = 32;
  if (base < 2) base = 2;
  if (base > 16) base = 16;
  char* ptr = &buf[32];
  *ptr = 0;
  if (val == 0) *--ptr = rep[0];
  while (val) {
    *--ptr = rep[val % base];
    val /= base;
  }
  while (ptr > buf + 32 - len) *--ptr = '0';
  return ptr;
}

}  // extern "C"

// ----------------------------------------------------- full scalar decode --

namespace povsc {

static float inverse_db(int i) {
  return pov::inverse_db(i);
}

// Direct IMDCT with exact-phase double trig table (debug/verification
// path, POV_IMDCT_DIRECT=1; profiled at 99% of the decode wall).
struct ImdctDirect {
  int n = 0;
  std::vector<double> cos_table;  // [4n]: cos(pi/(2n) * m)
  void init(int n_) {
    n = n_;
    cos_table.resize(4 * n);
    for (int m = 0; m < 4 * n; ++m)
      cos_table[m] = std::cos(M_PI / (2.0 * n) * m);
  }
  // y[j] = sum_k X[k] cos(pi/(2n) (2j+1+n/2)(2k+1)), j in [0,n)
  void backward(const float* in, float* out) const {
    int half = n / 2;
    std::vector<double> acc(n, 0.0);
    int period = 4 * n;
    for (int k = 0; k < half; ++k) {
      double xk = in[k];
      if (xk == 0.0) continue;
      int step = (2 * (2 * k + 1)) % period;
      int m = ((int64_t)(2 * k + 1) * (1 + n / 2)) % period;
      for (int j = 0; j < n; ++j) {
        acc[j] += xk * cos_table[m];
        m += step;
        if (m >= period) m -= period;
      }
    }
    for (int j = 0; j < n; ++j) out[j] = (float)acc[j];
  }
};

// O(n log n) IMDCT — the production path, via the standard DCT-IV folding
// down to ONE n/4-point complex FFT (the same collapse the reference gets
// by vendoring libvorbis' split-radix mdct — /root/reference/src/mdct.cpp —
// derived independently here).  With N = n/2, M = n/4:
//   y[j] = c[j + n/4] folded by DCT-IV symmetry (c[m+2N] = -c[m],
//          c[2N-1-m] = -c[m]), where
//   c[m] = sum_k X[k] cos(pi/N (k+1/2)(m+1/2))          (DCT-IV, size N)
// and splitting k into even / mirrored-odd halves gives
//   z[p]   = (X[2p] - i X[N-1-2p]) * e^{i pi p/N},      p in [0, M)
//   Z      = FFT_M^{+}(z)                               (sign(+) kernel)
//   t_q    = e^{i pi (q+1/4)/N} * Z[q]
//   c[2q]  = Re(t_q),   c[N-1-2q] = Im(t_q).
// Validated exact (float64 ~1e-10 at n=8192) against the direct transform;
// float math with double-precomputed tables keeps |err| ~1e-7 on unit-scale
// PCM (tests/test_native_capi.py drives the dump through the 1e-5
// differential harness bound).  vs the previous n-point-FFT formulation
// this is 4x fewer FFT points (2 fewer levels, quarter-size passes).
struct Imdct {
  int n = 0, half = 0, quarter = 0, levels = 0;  // levels = log2(n/4)
  bool direct = false;
  ImdctDirect direct_impl;
  std::vector<int> rev;       // bit-reversal permutation [M]
  std::vector<float> pre;     // [M*2] interleaved (re, im) of e^{i pi p/N}
  std::vector<float> twr, twi;  // per-level twiddles e^{+2 pi i j/len}, SoA
  std::vector<int> tw_off;    // [levels] offset of each level's table
  std::vector<float> postr, posti;  // [M] (re, im) of e^{i pi (q+1/4)/N}
  mutable std::vector<float> wr, wi;  // FFT work [M]
  mutable std::vector<float> cbuf;    // DCT-IV result [N]

  void init(int n_) {
    n = n_;
    half = n / 2;
    quarter = n / 4;
    const char* env = getenv("POV_IMDCT_DIRECT");
    direct = env && env[0] == '1';
    if (direct) {
      direct_impl.init(n);
      return;
    }
    const int M = quarter, N = half;
    levels = 0;
    while ((1 << levels) < M) ++levels;
    rev.resize(M);
    rev[0] = 0;
    for (int i = 1; i < M; ++i)
      rev[i] = (rev[i >> 1] >> 1) | ((i & 1) << (levels - 1));
    pre.resize(2 * M);
    for (int p = 0; p < M; ++p) {
      double ph = M_PI * p / N;
      pre[2 * p] = (float)std::cos(ph);
      pre[2 * p + 1] = (float)std::sin(ph);
    }
    tw_off.assign(levels, 0);
    int total = 0;
    for (int lv = 0; lv < levels; ++lv) total += (1 << lv);  // len/2 per level
    twr.resize(total);
    twi.resize(total);
    total = 0;
    for (int lv = 0; lv < levels; ++lv) {
      int len = 2 << lv;
      tw_off[lv] = total;
      for (int j = 0; j < len / 2; ++j) {
        double ph = 2.0 * M_PI * j / len;  // sign(+) kernel
        twr[total + j] = (float)std::cos(ph);
        twi[total + j] = (float)std::sin(ph);
      }
      total += len / 2;
    }
    postr.resize(M);
    posti.resize(M);
    for (int q = 0; q < M; ++q) {
      double ph = M_PI * (q + 0.25) / N;
      postr[q] = (float)std::cos(ph);
      posti[q] = (float)std::sin(ph);
    }
    wr.resize(M);
    wi.resize(M);
    cbuf.resize(N);
  }

  void backward(const float* in, float* out) const {
    if (direct) {
      direct_impl.backward(in, out);
      return;
    }
    transform(in);
    // fold DCT-IV to IMDCT output (m' = j + n/4 through c's symmetries)
    const float* __restrict c = cbuf.data();
    const int Q = quarter;
    for (int j = 0; j < Q; ++j) out[j] = c[j + Q];            // m' in [N/2, N)
    for (int j = Q; j < 3 * Q; ++j) out[j] = -c[3 * Q - 1 - j];  // 2N-1-m'
    for (int j = 3 * Q; j < n; ++j) out[j] = -c[j - 3 * Q];    // m' - 2N
  }

  // Fused IMDCT + window + overlap-add: dst[j] += imdct(in)[j] * win[j].
  // Skips materializing the raw pcm frame (one full write + re-read pass
  // per channel per frame) — used on the no-taps fast path; the tap path
  // needs the raw frame for "pcm_after_mdct" and keeps backward().
  void backward_wadd(const float* in, const float* __restrict win,
                     float* __restrict dst) const {
    if (direct) {  // rare (POV_IMDCT_DIRECT=1): unfused fallback
      std::vector<float> tmp((size_t)n);
      direct_impl.backward(in, tmp.data());
      for (int j = 0; j < n; ++j) dst[j] += tmp[j] * win[j];
      return;
    }
    transform(in);
    const float* __restrict c = cbuf.data();
    const int Q = quarter;
    for (int j = 0; j < Q; ++j) dst[j] += c[j + Q] * win[j];
    for (int j = Q; j < 3 * Q; ++j) dst[j] -= c[3 * Q - 1 - j] * win[j];
    for (int j = 3 * Q; j < n; ++j) dst[j] -= c[j - 3 * Q] * win[j];
  }

  // pre-twist + FFT + post-twist into cbuf (the DCT-IV of `in`)
  void transform(const float* in) const {
    const int M = quarter, N = half;
    float* __restrict re = wr.data();
    float* __restrict im = wi.data();
    // Adjacent radix-2 levels are fused pairwise into radix-4 passes: per
    // element the arithmetic is the IDENTICAL op sequence (level lv's
    // butterfly, then level lv+1's on the register values), so the output
    // is bit-identical to the unfused form — the fusion only removes the
    // store/reload sweep between the two levels (~half the memory passes).
    //
    // The pre-twist z[p] = (X[2p] - i X[N-1-2p]) e^{i pi p/N} is likewise
    // fused into the base pass: bit-reversal is an involution, so the four
    // inputs of output block [s, s+4) sit at p = rev[s+k] (= rev[s], +M/2,
    // +M/4, +3M/4) — the old separate scattered-write sweep becomes
    // scattered reads inside the base butterflies.
    // Base pass width: 8-point (levels 0+1+2) when the level count is odd
    // (>= 5), else 4-point — so the stages after the base always pair up
    // cleanly and the final stage is a fused pair except for tiny M.
    const int lv0 = (levels >= 5 && (levels & 1)) ? 3 : 2;
    if (lv0 == 3) {
      // levels 0+1+2 fused: an 8-point DFT per block (levels 0/1
      // multiply-free, level 2 with its table twiddles)
      const int* __restrict rv = rev.data();
      const float* __restrict pt = pre.data();
      const float* __restrict w2r_ = &twr[tw_off[2]];
      const float* __restrict w2i_ = &twi[tw_off[2]];
      for (int s = 0; s < M; s += 8) {
        float zr[8], zi[8];
        for (int k = 0; k < 8; ++k) {
          const int p = rv[s + k];
          const float u = in[2 * p], v = in[N - 1 - 2 * p];
          const float wre = pt[2 * p], wim = pt[2 * p + 1];
          zr[k] = u * wre + v * wim;
          zi[k] = u * wim - v * wre;
        }
        for (int k = 0; k < 8; k += 2) {  // level 0 (w = 1)
          const float urr = zr[k], uii = zi[k];
          const float vrr = zr[k + 1], vii = zi[k + 1];
          zr[k] = urr + vrr;
          zi[k] = uii + vii;
          zr[k + 1] = urr - vrr;
          zi[k + 1] = uii - vii;
        }
        for (int b0 = 0; b0 < 8; b0 += 4) {  // level 1 (w in {1, +i})
          float urr = zr[b0], uii = zi[b0];
          float vrr = zr[b0 + 2], vii = zi[b0 + 2];
          zr[b0] = urr + vrr;
          zi[b0] = uii + vii;
          zr[b0 + 2] = urr - vrr;
          zi[b0 + 2] = uii - vii;
          urr = zr[b0 + 1];
          uii = zi[b0 + 1];
          vrr = -zi[b0 + 3];  // v * (+i) = (-vi, vr), sign(+) kernel
          vii = zr[b0 + 3];
          zr[b0 + 1] = urr + vrr;
          zi[b0 + 1] = uii + vii;
          zr[b0 + 3] = urr - vrr;
          zi[b0 + 3] = uii - vii;
        }
        for (int k = 0; k < 4; ++k) {  // level 2
          const float vr2 = zr[k + 4] * w2r_[k] - zi[k + 4] * w2i_[k];
          const float vi2 = zr[k + 4] * w2i_[k] + zi[k + 4] * w2r_[k];
          const float urr = zr[k], uii = zi[k];
          re[s + k] = urr + vr2;
          im[s + k] = uii + vi2;
          re[s + k + 4] = urr - vr2;
          im[s + k + 4] = uii - vi2;
        }
      }
    } else if (levels >= 2) {
      // levels 0+1: a multiply-free 4-point DFT per block
      // (level-1 twiddles are {1, +i}; v * (+i) = (-vi, vr), sign(+) kernel)
      const int* __restrict rv = rev.data();
      const float* __restrict pt = pre.data();
      for (int s = 0; s < M; s += 4) {
        int p0 = rv[s], p1 = rv[s + 1], p2 = rv[s + 2], p3 = rv[s + 3];
        float u = in[2 * p0], v = in[N - 1 - 2 * p0];
        float wre = pt[2 * p0], wim = pt[2 * p0 + 1];
        float ur = u * wre + v * wim, ui = u * wim - v * wre;
        u = in[2 * p1];
        v = in[N - 1 - 2 * p1];
        wre = pt[2 * p1];
        wim = pt[2 * p1 + 1];
        float vr = u * wre + v * wim, vi = u * wim - v * wre;
        float a0r = ur + vr, a0i = ui + vi;
        float b0r = ur - vr, b0i = ui - vi;
        u = in[2 * p2];
        v = in[N - 1 - 2 * p2];
        wre = pt[2 * p2];
        wim = pt[2 * p2 + 1];
        ur = u * wre + v * wim;
        ui = u * wim - v * wre;
        u = in[2 * p3];
        v = in[N - 1 - 2 * p3];
        wre = pt[2 * p3];
        wim = pt[2 * p3 + 1];
        vr = u * wre + v * wim;
        vi = u * wim - v * wre;
        float c0r = ur + vr, c0i = ui + vi;
        float d0r = ur - vr, d0i = ui - vi;
        re[s] = a0r + c0r;
        im[s] = a0i + c0i;
        re[s + 2] = a0r - c0r;
        im[s + 2] = a0i - c0i;
        float v1r = -d0i, v1i = d0r;
        re[s + 1] = b0r + v1r;
        im[s + 1] = b0i + v1i;
        re[s + 3] = b0r - v1r;
        im[s + 3] = b0i - v1i;
      }
    } else {  // M <= 2 (no Vorbis blocksize this small; kept total)
      for (int p = 0; p < M; ++p) {
        float u = in[2 * p];
        float v = in[N - 1 - 2 * p];
        float wre = pre[2 * p], wim = pre[2 * p + 1];
        int r = rev[p];
        re[r] = u * wre + v * wim;
        im[r] = u * wim - v * wre;
      }
      if (levels == 1) {
        float ur = re[0], ui = im[0], vr = re[1], vi = im[1];
        re[0] = ur + vr;
        im[0] = ui + vi;
        re[1] = ur - vr;
        im[1] = ui - vi;
      }
    }
    // The post-twist (t_q = e^{i pi (q+1/4)/N} Z[q]; c[2q]=Re, c[N-1-2q]=Im)
    // is fused into the FINAL butterfly stage below — its outputs are
    // twisted straight out of registers into cbuf, never stored back to
    // re/im.  Same per-element ops, one fewer full sweep.
    float* __restrict c = cbuf.data();
    const float* __restrict ar = postr.data();
    const float* __restrict ai = posti.data();
    if (levels <= 2) {  // base pass was final (M <= 4; no real stream)
      for (int q = 0; q < M; ++q) {
        float tr = ar[q] * re[q] - ai[q] * im[q];
        float ti = ar[q] * im[q] + ai[q] * re[q];
        c[2 * q] = tr;
        c[N - 1 - 2 * q] = ti;
      }
      return;
    }
    // stages past the base pair up; only levels==3 leaves a final single
    const int final_lv = ((levels - lv0) & 1) ? levels - 1 : levels - 2;
    int lv = lv0;
    for (; lv < final_lv; lv += 2) {
      // fused pair: level lv (half-length hl, same twiddle for the (a,b)
      // and (c,d) butterflies) then level lv+1 ((a,c) with w2[j], (b,d)
      // with w2[j+hl]) on the in-register values
      const int hl = 1 << lv;
      const float* __restrict w1r = &twr[tw_off[lv]];
      const float* __restrict w1i = &twi[tw_off[lv]];
      const float* __restrict w2r = &twr[tw_off[lv + 1]];
      const float* __restrict w2i = &twi[tw_off[lv + 1]];
      for (int s = 0; s < M; s += 4 * hl) {
        float* __restrict ra = re + s;
        float* __restrict ia = im + s;
        float* __restrict rb = ra + hl;
        float* __restrict ib = ia + hl;
        float* __restrict rc = ra + 2 * hl;
        float* __restrict ic = ia + 2 * hl;
        float* __restrict rd = ra + 3 * hl;
        float* __restrict id = ia + 3 * hl;
        // ivdep: iteration j touches only index j of each (disjoint)
        // quarter block, so there are no loop-carried dependences; gcc
        // cannot prove that through the derived pointers and otherwise
        // leaves this hottest loop scalar ("no vectype" at -O3
        // -march=native).  Vectorized elementwise FP keeps per-element
        // operation order: results stay bit-identical (harness-proven).
#pragma GCC ivdep
        for (int j = 0; j < hl; ++j) {
          float wre = w1r[j], wim = w1i[j];
          float vbr = rb[j] * wre - ib[j] * wim;
          float vbi = rb[j] * wim + ib[j] * wre;
          float uar = ra[j], uai = ia[j];
          float a1r = uar + vbr, a1i = uai + vbi;
          float b1r = uar - vbr, b1i = uai - vbi;
          float vdr = rd[j] * wre - id[j] * wim;
          float vdi = rd[j] * wim + id[j] * wre;
          float ucr = rc[j], uci = ic[j];
          float c1r = ucr + vdr, c1i = uci + vdi;
          float d1r = ucr - vdr, d1i = uci - vdi;
          float w2re = w2r[j], w2im = w2i[j];
          float vcr = c1r * w2re - c1i * w2im;
          float vci = c1r * w2im + c1i * w2re;
          ra[j] = a1r + vcr;
          ia[j] = a1i + vci;
          rc[j] = a1r - vcr;
          ic[j] = a1i - vci;
          float w3re = w2r[j + hl], w3im = w2i[j + hl];
          float vqr = d1r * w3re - d1i * w3im;
          float vqi = d1r * w3im + d1i * w3re;
          rb[j] = b1r + vqr;
          ib[j] = b1i + vqi;
          rd[j] = b1r - vqr;
          id[j] = b1i - vqi;
        }
      }
    }
    if (final_lv == levels - 1) {
      // final stage = one radix-2 level (hl = M/2) + fused post-twist
      const int hl = 1 << final_lv;
      const float* __restrict wre = &twr[tw_off[final_lv]];
      const float* __restrict wim = &twi[tw_off[final_lv]];
      const float* __restrict rq = re + hl;
      const float* __restrict iq = im + hl;
      // ivdep: c's strided stores (2j, N-1-2j, with q = j + hl) never
      // collide across iterations (even vs odd indices, each written
      // once); see the middle-pass note on bit-identity
#pragma GCC ivdep
      for (int j = 0; j < hl; ++j) {
        float vr = rq[j] * wre[j] - iq[j] * wim[j];
        float vi = rq[j] * wim[j] + iq[j] * wre[j];
        float ur = re[j], ui = im[j];
        float xr = ur + vr, xi = ui + vi;  // Z[j]
        float yr = ur - vr, yi = ui - vi;  // Z[j + hl]
        c[2 * j] = ar[j] * xr - ai[j] * xi;
        c[N - 1 - 2 * j] = ar[j] * xi + ai[j] * xr;
        const int q = j + hl;
        c[2 * q] = ar[q] * yr - ai[q] * yi;
        c[N - 1 - 2 * q] = ar[q] * yi + ai[q] * yr;
      }
    } else {
      // final stage = one fused level pair (hl = M/4, a single M-block)
      // + fused post-twist on its four register outputs
      const int hl = 1 << final_lv;
      const float* __restrict w1r = &twr[tw_off[final_lv]];
      const float* __restrict w1i = &twi[tw_off[final_lv]];
      const float* __restrict w2r = &twr[tw_off[final_lv + 1]];
      const float* __restrict w2i = &twi[tw_off[final_lv + 1]];
      const float* __restrict rb = re + hl;
      const float* __restrict ib = im + hl;
      const float* __restrict rc = re + 2 * hl;
      const float* __restrict ic = im + 2 * hl;
      const float* __restrict rd = re + 3 * hl;
      const float* __restrict id = im + 3 * hl;
      // ivdep: same disjointness as the middle pass; c's stores are the
      // radix-2 final's pattern at four offsets
#pragma GCC ivdep
      for (int j = 0; j < hl; ++j) {
        float wre = w1r[j], wim = w1i[j];
        float vbr = rb[j] * wre - ib[j] * wim;
        float vbi = rb[j] * wim + ib[j] * wre;
        float uar = re[j], uai = im[j];
        float a1r = uar + vbr, a1i = uai + vbi;
        float b1r = uar - vbr, b1i = uai - vbi;
        float vdr = rd[j] * wre - id[j] * wim;
        float vdi = rd[j] * wim + id[j] * wre;
        float ucr = rc[j], uci = ic[j];
        float c1r = ucr + vdr, c1i = uci + vdi;
        float d1r = ucr - vdr, d1i = uci - vdi;
        float w2re = w2r[j], w2im = w2i[j];
        float vcr = c1r * w2re - c1i * w2im;
        float vci = c1r * w2im + c1i * w2re;
        float f0r = a1r + vcr, f0i = a1i + vci;  // Z[j]
        float f2r = a1r - vcr, f2i = a1i - vci;  // Z[j + 2 hl]
        float w3re = w2r[j + hl], w3im = w2i[j + hl];
        float vqr = d1r * w3re - d1i * w3im;
        float vqi = d1r * w3im + d1i * w3re;
        float f1r = b1r + vqr, f1i = b1i + vqi;  // Z[j + hl]
        float f3r = b1r - vqr, f3i = b1i - vqi;  // Z[j + 3 hl]
        c[2 * j] = ar[j] * f0r - ai[j] * f0i;
        c[N - 1 - 2 * j] = ar[j] * f0i + ai[j] * f0r;
        int q = j + hl;
        c[2 * q] = ar[q] * f1r - ai[q] * f1i;
        c[N - 1 - 2 * q] = ar[q] * f1i + ai[q] * f1r;
        q = j + 2 * hl;
        c[2 * q] = ar[q] * f2r - ai[q] * f2i;
        c[N - 1 - 2 * q] = ar[q] * f2i + ai[q] * f2r;
        q = j + 3 * hl;
        c[2 * q] = ar[q] * f3r - ai[q] * f3i;
        c[N - 1 - 2 * q] = ar[q] * f3i + ai[q] * f3r;
      }
    }
  }
};

struct Window {
  std::vector<float> w;  // [variants * n]
  int n = 0;
  bool long_block = false;
  void init(int n_, bool long_block_, int bs0, int bs1) {
    n = n_;
    long_block = long_block_;
    int variants = long_block ? 4 : 1;
    w.assign((size_t)variants * n, 0.f);
    for (int v = 0; v < variants; ++v) {
      int left = (v & 1 ? bs1 : bs0) / 2;
      int right = (v & 2 ? bs1 : bs0) / 2;
      if (!long_block) left = right = bs0 / 2;
      int left_begin = n / 4 - left / 2;
      int right_begin = n - n / 4 - right / 2;
      float* win = &w[(size_t)v * n];
      for (int i = 0; i < left; ++i) {
        double x = std::sin(M_PI / 2 * (i + 0.5) / left);
        win[left_begin + i] = (float)std::sin(M_PI / 2 * x * x);
      }
      for (int i = left_begin + left; i < right_begin; ++i) win[i] = 1.f;
      for (int i = 0; i < right; ++i) {
        double x = std::sin(M_PI / 2 * (right - i - 0.5) / right);
        win[right_begin + i] = (float)std::sin(M_PI / 2 * x * x);
      }
    }
  }
  const float* get(int variant) const { return &w[(size_t)variant * n]; }
};

// Absolute-timeline overlap-add state (see runtime/state.py for the model;
// behaviorally identical to the reference's ring buffer).
struct OlaState {
  int channels = 0;
  // Persistent per-channel storage; the logical window
  // [buf_start, buf_start + len) lives at storage offset `head`.  The
  // previous design allocated + zeroed a fresh buffer and copied the
  // overlap EVERY frame (~1.5 window-lengths of libc traffic + a
  // malloc/free pair per frame, invisible to gprof); now the front drop
  // just advances `head`, only the newly exposed tail is zeroed, and the
  // live region slides back to offset 0 with an amortized memmove once
  // `head` drifts past a few window lengths.
  std::vector<std::vector<float>> store;
  int64_t head = 0, len = 0;
  int64_t buf_start = 0, frame_pos = 0, emit_pos = 0;
  int prev_win = 0, cur_win = 0;
  uint64_t abs_total = 0;
  int64_t expected_ending = -1;

  void init(int ch) {
    channels = ch;
    store.assign(ch, {});
    head = len = 0;
  }

  const float* chan(int c) const { return store[c].data() + head; }

  void begin_frame(int win_size) {
    int64_t new_pos =
        cur_win > 0 ? frame_pos + (int64_t)(cur_win / 4) * 3 - win_size / 4 : 0;
    prev_win = cur_win;
    cur_win = win_size;
    frame_pos = new_pos;
    int64_t new_start = std::min(emit_pos, new_pos);
    int64_t new_end = new_pos + win_size;
    // Live overlap between the old window [buf_start, buf_start+len) and
    // the new one [new_start, new_end).  NOTE new_start can move BACKWARDS
    // (short->long transition: new_pos = p + 3*short/4 - long/4 < p), so
    // the kept region lands at dst_off > 0 inside the new window.
    int64_t L = new_end - new_start;
    int64_t lo = std::max(buf_start, new_start);
    int64_t hi = std::min(buf_start + len, new_end);
    int64_t keep = hi > lo ? hi - lo : 0;
    int64_t src_off = keep ? lo - buf_start : 0;   // old logical coords
    int64_t dst_off = keep ? lo - new_start : 0;   // new logical coords
    // kept data sits at storage offset head+src_off; it must land at
    // head'+dst_off.  Slide to the front when head' would go negative
    // (backward extension past the storage start) or drift too far right.
    int64_t want = head + src_off - dst_off;
    if (want < 0 || want > 4 * L) {
      for (int c = 0; c < channels; ++c) {
        if ((int64_t)store[c].size() < L) store[c].resize(L);
        if (keep)
          memmove(store[c].data() + dst_off, store[c].data() + head + src_off,
                  sizeof(float) * (size_t)keep);
      }
      head = 0;
    } else {
      head = want;
      for (int c = 0; c < channels; ++c)
        if ((int64_t)store[c].size() < head + L) store[c].resize(head + L);
    }
    for (int c = 0; c < channels; ++c) {
      std::fill_n(store[c].data() + head, (size_t)dst_off, 0.f);
      std::fill_n(store[c].data() + head + dst_off + keep,
                  (size_t)(L - dst_off - keep), 0.f);
    }
    len = L;
    buf_start = new_start;
  }

  void add_frame(int c, const float* pcm, const float* win, int n) {
    float* dst = frame_dst(c);
    for (int i = 0; i < n; ++i) dst[i] += pcm[i] * win[i];
  }

  // where the current frame accumulates (for the fused IMDCT+window path)
  float* frame_dst(int c) {
    return store[c].data() + head + (frame_pos - buf_start);
  }

  // returns (offset into buf, num) of emitted region; num<0 on error
  std::pair<int64_t, int64_t> ready() {
    int64_t num = 0;
    if (prev_win > 0) num = frame_pos + cur_win / 2 - emit_pos;
    if (expected_ending >= 0) {
      if ((int64_t)abs_total > expected_ending) return {0, -1};
      if ((int64_t)abs_total + num >= expected_ending)
        num = expected_ending - abs_total;
      else
        return {0, -2};
    }
    int64_t off = emit_pos - buf_start;
    abs_total += num;
    emit_pos = frame_pos + cur_win / 2;
    if (expected_ending >= 0 && (int64_t)abs_total != expected_ending)
      return {0, -3};
    return {off, num};
  }
};

// Collects a stream's emitted PCM when the decode was started through
// pov_decode_pcm — the direct PCM consumer API (the callback/dump path
// is unaffected; this is the native host route the Python side exposes
// as decode_corpus(route="native")).
struct PcmSink {
  uint32_t sample_rate = 0;
  std::vector<std::vector<float>> chans;
};

// Zero-copy variant: PCM lands straight in a caller-owned [channels, cap]
// row-major buffer (float32 or int16) as it is emitted — no sink growth,
// no copy-out pass.  Serves pov_decode_pcm_into's single-stream fast
// path; every "pov-into:"-prefixed failure (multi-stream blob, channel
// mismatch vs the caller's pre-scan, emitted-sample overflow) is the
// caller's cue to retry via the general handle API.
struct DirectSink {
  void* out = nullptr;
  int64_t cap = 0;      // per-channel capacity (row stride)
  int64_t written = 0;  // emitted samples so far (per channel)
  int channels = 0;
  bool i16 = false;
  bool claimed = false;  // one logical stream only
};

// The framework's float->int16 PCM contract (see pov_pcm_get_i16 below
// for the bit-parity + vectorization notes).
static inline void convert_pcm_i16(const float* __restrict src,
                                   int16_t* __restrict dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = src[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    dst[i] = (int16_t)(int32_t)__builtin_rintf(v);
  }
}

// Raised when a pov::ParseCallbacks hook returns false: a CLEAN stop
// (the public full_read catches it and reports success — see pov.hpp).
struct StopParsing {};

struct ScalarStream {
  pov::Setup setup;
  uint32_t sample_rate = 0;
  int channels = 0;
  PcmSink* sink = nullptr;
  DirectSink* dsink = nullptr;  // caller-owned output (pov_decode_pcm_into)
  int64_t reserve_hint = 0;  // expected emitted samples (sink pre-size)
  int64_t reserve_total_cap = 0;  // plausibility bound on hint * channels
  pov::ParseCallbacks* cb = nullptr;  // public C++ consumer (pov.hpp)
  std::vector<pov::PcmRange> cb_ranges;  // borrowed views handed to cb
  int bs0 = 0, bs1 = 0;
  int packet_count = 0;
  Imdct mdct[2];
  std::vector<Window> windows;  // per mode
  OlaState state;
  // cross-page packet reassembly (page-spanning packets)
  std::vector<uint8_t> pending;
  bool has_pending = false;
  // per-frame scratch, reused across packets: steady-state decode is
  // allocation-free (assign() memsets into retained capacity).  The u32
  // tap-staging copies are built only when a dump sink is active.
  std::vector<std::vector<float>> sc_floor, sc_res;
  std::vector<uint8_t> sc_floor_decoded, sc_floor_used, sc_curve, sc_flag;
  std::vector<float> sc_pcm;
  std::vector<uint32_t> sc_tap32;
  std::vector<int64_t> sc_ys, sc_fin;
  std::vector<uint8_t> sc_cls, sc_chan_used;
  std::vector<int> sc_chans;

  void parse_headers_packet(const uint8_t* pkt, size_t len) {
    if (packet_count == 0) {
      POV_CHECK(len >= 30 && pkt[0] == 1 && !memcmp(pkt + 1, "vorbis", 6),
                "bad id header");
      uint32_t version;
      memcpy(&version, pkt + 7, 4);
      POV_CHECK(version == 0, "vorbis version");
      channels = pkt[11];
      POV_CHECK(channels >= 1, "channel count");
      memcpy(&sample_rate, pkt + 12, 4);
      uint8_t bs = pkt[28];
      bs0 = 1 << (bs & 0xf);
      bs1 = 1 << (bs >> 4);
      POV_CHECK(bs0 >= 64 && bs1 <= 8192 && bs0 <= bs1, "blocksize range");
      POV_CHECK(pkt[29] == 1, "id framing");
      if (sink) {
        sink->sample_rate = sample_rate;
        sink->chans.resize(channels);
        // full_read's pre-scan found this stream's final granule (= its
        // emitted sample count for a complete file): one exact up-front
        // reservation instead of doubling-growth reallocs across the
        // whole decode (~34 ms on a 64 s stereo file, single-core host).
        // The plausibility bound is re-checked against the now-known
        // channel count: a lying granule times a lying 255-channel id
        // header must not multiply into an unbounded reservation
        if (reserve_hint > 0 &&
            (int64_t)channels * reserve_hint <= reserve_total_cap)
          for (auto& v : sink->chans) v.reserve((size_t)reserve_hint);
      }
      if (dsink)  // caller sized the buffer from its own id-header scan
        POV_CHECK(channels == dsink->channels, "pov-into: channel mismatch");
      if (cb) {
        pov::IdHeaderInfo info;
        info.vorbis_version = version;
        info.channels = channels;
        info.sample_rate = sample_rate;
        memcpy(&info.bitrate_maximum, pkt + 16, 4);
        memcpy(&info.bitrate_nominal, pkt + 20, 4);
        memcpy(&info.bitrate_minimum, pkt + 24, 4);
        info.blocksize_0 = bs0;
        info.blocksize_1 = bs1;
        if (!cb->gotHeader(info)) throw StopParsing{};
      }
    } else if (packet_count == 1) {
      POV_CHECK(len >= 7 && pkt[0] == 3, "bad comment header");
      if (cb) {
        // vendor + user comment list (v-comment spec; same strictness
        // as the Python parser, vorbis/header.py:parse_comment_header)
        POV_CHECK(!memcmp(pkt + 1, "vorbis", 6), "comment header magic");
        size_t off = 7;
        uint32_t vlen;
        POV_CHECK(off + 4 <= len, "comment vendor length");
        memcpy(&vlen, pkt + off, 4);
        off += 4;
        POV_CHECK(off + vlen <= len, "comment vendor");
        std::string vendor((const char*)pkt + off, vlen);
        off += vlen;
        uint32_t count;
        POV_CHECK(off + 4 <= len, "comment list length");
        memcpy(&count, pkt + off, 4);
        POV_CHECK(off + (size_t)count * 4 < len, "comment list size");
        off += 4;
        std::vector<std::string> comments(count);
        for (uint32_t i = 0; i < count; ++i) {
          uint32_t clen;
          POV_CHECK(off + 4 <= len, "comment entry length");
          memcpy(&clen, pkt + off, 4);
          off += 4;
          POV_CHECK(off + clen <= len, "comment entry");
          comments[i].assign((const char*)pkt + off, clen);
          off += clen;
        }
        POV_CHECK(off + 1 == len, "comment framing position");
        POV_CHECK(pkt[off] == 1, "comment framing bit");
        if (!cb->gotComments(vendor, comments)) throw StopParsing{};
      }
    } else {
      POV_CHECK(len >= 7 && pkt[0] == 5 && !memcmp(pkt + 1, "vorbis", 6),
                "bad setup header");
      pov::BitReader sbr(pkt + 7, len - 7);
      setup.parse(sbr, channels);
      mdct[0].init(bs0);
      mdct[1].init(bs1);
      windows.resize(setup.modes.size());
      for (size_t m = 0; m < setup.modes.size(); ++m) {
        bool lb = setup.modes[m].block_flag;
        windows[m].init(lb ? bs1 : bs0, lb, bs0, bs1);
      }
      state.init(channels);
      // the PCM routes (handle sink AND zero-copy DirectSink) never
      // touch the dump subsystem: registering would consume the
      // thread-local pending dump config armed for the next dump-face
      // decode and write PCM-route taps into its output
      const bool dump_face = !sink && !dsink;
      if (dump_face) {
        register_decoder_ref(this, "ParseOggVorbis", sample_rate, channels);
        register_decoder_alias(this, &state);
      }
      for (size_t fi = 0; fi < setup.floors.size(); ++fi) {
        if (setup.floor_types[fi] != 1) continue;
        const pov::Floor1& f1 = setup.floors[fi];
        if (dump_face) register_decoder_alias(this, &f1);
        uint8_t mult = (uint8_t)f1.multiplier;
        push_data_u8(this, "floor1_unpack multiplier", -1, &mult, 1);
        push_data_u32(this, "floor1_unpack xs", -1, f1.xs.data(), f1.xs.size());
      }
      push_data_u8(this, "finish_setup", -1, nullptr, 0);
      if (cb) {
        pov::SetupInfo info;
        info.num_codebooks = (int)setup.codebooks.size();
        info.num_floors = (int)setup.floors.size();
        info.num_residues = (int)setup.residues.size();
        info.num_mappings = (int)setup.mappings.size();
        info.num_modes = (int)setup.modes.size();
        if (!cb->gotSetup(info)) throw StopParsing{};
      }
    }
    ++packet_count;
  }

  void parse_audio(const uint8_t* pkt, size_t len) {
    if (len == 0) return;  // legal framing, undecodable audio: skipped
    // (spec 4.3.1 EOP; libvorbis OV_ENOTAUDIO) — never fabricate a
    // frame from the over-end BitReader's zero bits
    push_data_u8(this, "start_audio_packet", -1, nullptr, 0);
    uint64_t atp = state.abs_total;
    push_data_u64(this, "abs_total_pos", -1, &atp, 1);
    int64_t eep = state.expected_ending;
    push_data_i64(this, "expected_ending_total_pos", -1, &eep, 1);

    pov::BitReader br(pkt, len);
    POV_CHECK(br.read(1) == 0, "audio packet type bit");
    int mode_idx = (int)br.read(pov::ilog((uint32_t)setup.modes.size() - 1));
    POV_CHECK(mode_idx < (int)setup.modes.size(), "mode number out of range");
    const pov::Mode& mode = setup.modes[mode_idx];
    const pov::Mapping& mapping = setup.mappings[mode.mapping];
    int prev_flag = 0, next_flag = 0;
    if (mode.block_flag) {
      prev_flag = (int)br.read(1);
      next_flag = (int)br.read(1);
    }
    int n = mode.block_flag ? bs1 : bs0;
    int half = n / 2;
    int C = channels;
    state.begin_frame(n);

    // 4.3.2 floor decode
    const bool taps = povcb::taps_active();
    if ((int)sc_floor.size() < C) {
      sc_floor.resize(C);
      sc_res.resize(C);
    }
    std::vector<std::vector<float>>& floor_out = sc_floor;
    // grow-only scratch: every read region is fully overwritten below
    // (decoded floors write [0, rn); undecoded channels are zeroed at
    // their skip sites — the memsets this replaces were ~40% of the
    // per-frame byte traffic in the no-taps fast path)
    for (int ch = 0; ch < C; ++ch)
      if ((int)floor_out[ch].size() < n) floor_out[ch].assign(n, 0.f);
    sc_floor_decoded.assign(C, 0);
    sc_floor_used.assign(C, 0);
    std::vector<uint8_t>& floor_decoded = sc_floor_decoded;
    std::vector<uint8_t>& floor_used = sc_floor_used;
    for (int ch = 0; ch < C; ++ch) {
      uint8_t fl = mapping.submaps[mapping.muxs[ch]].floor;
      push_data_u8(this, "floor_number", ch, &fl, 1);
      if (setup.floor_types[fl] == 0) {
        // LSP floor (spec 6.2) — beyond the reference, which rejects here
        int64_t amp = 0;
        std::vector<float> coeffs;
        if (setup.floor0s[fl].decode_coeffs(br, setup.codebooks, &amp,
                                            coeffs)) {
          floor_decoded[ch] = floor_used[ch] = 1;
          setup.floor0s[fl].curve(amp, coeffs, half, floor_out[ch].data());
          if (taps)  // the n-length tap reads past the half the decode uses
            std::fill(floor_out[ch].begin() + half,
                      floor_out[ch].begin() + n, 0.f);
          push_data_float(this, "floor_outputs", ch, floor_out[ch].data(), n);
        } else {
          // unused channel: coupling propagate may still mark it used, and
          // the dot product then multiplies by this (must-be-zero) envelope
          std::fill_n(floor_out[ch].data(), half, 0.f);
        }
        continue;
      }
      const pov::Floor1& f1 = setup.floors[fl];
      std::vector<int64_t>& ys = sc_ys;
      if (!f1.decode_ys(br, setup.codebooks, ys)) {
        std::fill_n(floor_out[ch].data(), half, 0.f);  // see floor0 skip
        continue;
      }
      floor_decoded[ch] = floor_used[ch] = 1;
      if (taps) {
        sc_tap32.assign(ys.begin(), ys.end());
        push_data_u32(this, "floor1 ys", -1, sc_tap32.data(),
                      sc_tap32.size());
      }
      std::vector<int64_t>& fin = sc_fin;
      std::vector<uint8_t>& flag = sc_flag;
      f1.synthesize(ys, fin, flag);
      if (taps) {
        sc_tap32.assign(fin.begin(), fin.end());
        push_data_u32(this, "floor1 final_ys", -1, sc_tap32.data(),
                      sc_tap32.size());
        // DT_Bool (type id 5), matching the reference's bool tap
        povcb::push_data<uint8_t>(this, "floor1 step2_flag", -1, flag.data(),
                                  flag.size(), 5, "bool");
      }
      // the decode only consumes curve[0, half); the full-n render and
      // dB-table fill exist for the "floor1 floor"/"floor_outputs" taps
      if (taps) {
        // the full-n byte curve exists for the "floor1 floor" tap
        if ((int)sc_curve.size() < n) sc_curve.resize(n);
        std::vector<uint8_t>& curve = sc_curve;  // render overwrites [0, n)
        f1.render(fin, flag, n, curve.data());
        sc_tap32.assign(curve.begin(), curve.end());
        push_data_u32(this, "floor1 floor", -1, sc_tap32.data(),
                      sc_tap32.size());
        for (int i = 0; i < n; ++i) floor_out[ch][i] = inverse_db(curve[i]);
        push_data_float(this, "floor_outputs", ch, floor_out[ch].data(), n);
      } else {
        // fused render + dB lookup straight into the envelope (the decode
        // only consumes [0, half); identical y sequence to render())
        f1.render_env(fin, flag, half, floor_out[ch].data());
      }
    }

    // 4.3.3 nonzero vector propagate
    for (auto& cp : mapping.couplings)
      if (floor_used[cp.first] || floor_used[cp.second])
        floor_used[cp.first] = floor_used[cp.second] = 1;

    // 4.3.4 residue decode
    std::vector<std::vector<float>>& res = sc_res;
    // grow-only: every channel belongs to exactly one submap, so the
    // zero-fill + decode below fully rewrites res[ch][0, half) each frame
    for (int ch = 0; ch < C; ++ch)
      if ((int)res[ch].size() < half) res[ch].resize(half);
    for (size_t si = 0; si < mapping.submaps.size(); ++si) {
      std::vector<int>& chans = sc_chans;
      chans.clear();
      for (int ch = 0; ch < C; ++ch)
        if (mapping.muxs[ch] == si) chans.push_back(ch);
      std::vector<uint8_t>& chan_used = sc_chan_used;
      chan_used.assign(chans.size(), 0);
      for (size_t k = 0; k < chans.size(); ++k) chan_used[k] = floor_used[chans[k]];
      const pov::Residue& r = setup.residues[mapping.submaps[si].residue];
      // decode straight into the channel planes (zeroed first: residue
      // decode accumulates) — no staging buffer, no per-channel memcpy
      POV_CHECK(chans.size() <= 256, "submap channels");
      float* planes[256];
      for (size_t k = 0; k < chans.size(); ++k) {
        planes[k] = res[chans[k]].data();
        std::fill_n(planes[k], (size_t)half, 0.f);
      }
      r.decode_planes(br, setup.codebooks, (int)chans.size(),
                      chan_used.data(), half, planes, -1, &sc_cls);
    }
    for (int ch = 0; ch < C; ++ch)
      push_data_float(this, "after_residue", ch, res[ch].data(), half);

    // 4.3.5 inverse coupling (reverse order).  Branchless form of the
    // spec 4.3.5 sign cases: with t = (m>0 ? a : -a), the four branches
    // collapse to (a>0) ? {M=m, A=m-t} : {M=m+t, A=m} — the SAME single
    // add per element as the branchy form (selects only route values),
    // so results are bit-identical while the loop vectorizes (blends)
    // instead of branch-missing on sign-random spectra
    for (size_t i = mapping.couplings.size(); i > 0; --i) {
      auto& cp = mapping.couplings[i - 1];
      float* __restrict M = res[cp.first].data();
      float* __restrict A = res[cp.second].data();
#pragma GCC ivdep
      for (int j = 0; j < half; ++j) {
        float m = M[j], a = A[j];
        float t = (m > 0.f) ? a : -a;
        bool pos = a > 0.f;
        M[j] = pos ? m : m + t;
        A[j] = pos ? m - t : m;
      }
    }

    // 4.3.6 dot product
    for (int ch = 0; ch < C; ++ch) {
      if (floor_used[ch])
        for (int j = 0; j < half; ++j) res[ch][j] *= floor_out[ch][j];
      push_data_float(this, "after_envelope", ch, res[ch].data(), half);
    }

    // 4.3.7 inverse MDCT + window + overlap-add
    const Imdct& im = mdct[mode.block_flag ? 1 : 0];
    const Window& wn = windows[mode_idx];
    const float* win = wn.get(mode.block_flag ? prev_flag + 2 * next_flag : 0);
    if (taps) {
      sc_pcm.resize(n);  // fully overwritten by the IMDCT
      float* pcm = sc_pcm.data();
      for (int ch = 0; ch < C; ++ch) {
        im.backward(res[ch].data(), pcm);
        push_data_float(this, "pcm_after_mdct", ch, pcm, n);
        state.add_frame(ch, pcm, win, n);
      }
    } else {
      // fused IMDCT+window+accumulate: the raw frame ("pcm_after_mdct")
      // is only needed by the tap path; bit-identical accumulation
      // (dst -= c*w and dst += (-c)*w round once either way)
      for (int ch = 0; ch < C; ++ch)
        im.backward_wadd(res[ch].data(), win, state.frame_dst(ch));
    }

    push_data_u8(this, "finish_audio_packet", -1, nullptr, 0);
    auto em = state.ready();
    POV_CHECK(em.second >= 0, "granule position error");
    if (em.second > 0) {
      for (int ch = 0; ch < C; ++ch)
        push_data_float(this, "pcm", ch, state.chan(ch) + em.first,
                        em.second);
      if (sink)
        for (int ch = 0; ch < C; ++ch)
          sink->chans[ch].insert(sink->chans[ch].end(),
                                 state.chan(ch) + em.first,
                                 state.chan(ch) + em.first + em.second);
      if (dsink) {
        POV_CHECK(dsink->written + em.second <= dsink->cap,
                  "pov-into: emitted samples overflow the caller buffer");
        for (int ch = 0; ch < C; ++ch) {
          const float* src = state.chan(ch) + em.first;
          const int64_t at = (int64_t)ch * dsink->cap + dsink->written;
          if (dsink->i16)
            convert_pcm_i16(src, (int16_t*)dsink->out + at, em.second);
          else
            memcpy((float*)dsink->out + at, src,
                   sizeof(float) * (size_t)em.second);
        }
        dsink->written += em.second;
      }
      if (cb) {
        cb_ranges.resize(C);
        for (int ch = 0; ch < C; ++ch)
          cb_ranges[ch] = pov::PcmRange{state.chan(ch) + em.first,
                                        (size_t)em.second};
        if (!cb->gotPcmData(cb_ranges)) throw StopParsing{};
      }
    }
  }
};

// NOTE: this page walk intentionally duplicates the strict reference
// semantics (fail on bad CRC, fail on non-Vorbis BOS) rather than
// reusing the batch front-end's tolerant demux — it IS the reference-
// parity surface (ogg_vorbis_full_read).  The Python native route
// pre-demuxes non-Vorbis multiplexes before calling pov_decode_pcm
// (runtime/batch._split_vorbis_serials).
static void full_read(const uint8_t* data, size_t len,
                      std::vector<std::unique_ptr<PcmSink>>* sinks = nullptr,
                      pov::ParseCallbacks* cb = nullptr,
                      DirectSink* dsink = nullptr) {
  std::map<uint32_t, ScalarStream> streams;
  // decode errors must not leak registry entries keyed by the dying
  // ScalarStreams (dangling refs + open dump FILE*s + a permanently
  // nonzero fast-path counter)
  struct Unregister {
    std::map<uint32_t, ScalarStream>* s;
    ~Unregister() {
      for (auto& kv : *s) unregister_decoder_ref(&kv.second);
    }
  } cleanup{&streams};
  // PCM-consumer runs pre-scan each stream's final granule position (=
  // emitted sample count for a complete file) so its sink reserves once
  // instead of realloc-growing.  Header hops only — no CRC, no payload
  // reads (~free next to the decode).  A hostile/lying granule is capped
  // (64 samples/byte is ~14x the thinnest real Vorbis stream) so it can
  // at worst waste one bounded allocation, never bad_alloc a decodable
  // file; the decode itself never trusts the hint.
  std::map<uint32_t, int64_t> final_granule;
  if (sinks) {
    const int64_t cap = (int64_t)len * 64;
    size_t soff = 0;
    while (soff + 27 <= len && memcmp(data + soff, "OggS", 4) == 0) {
      int64_t g;
      uint32_t ser;
      memcpy(&g, data + soff + 6, 8);
      memcpy(&ser, data + soff + 14, 4);
      int ns = data[soff + 26];
      if (soff + 27 + ns > len) break;
      size_t dl = 0;
      for (int i = 0; i < ns; ++i) dl += data[soff + 27 + i];
      if (g >= 0 && g <= cap) final_granule[ser] = g;
      soff += 27 + ns + dl;
    }
  }
  // page-loop scratch, hoisted: a fresh pair of vectors per page is an
  // alloc/free pair every ~4KB of input (thousands per file)
  struct Pkt { const uint8_t* p; size_t len; };
  std::vector<Pkt> completed;
  std::vector<uint8_t> assembled;
  size_t off = 0;
  while (off < len) {
    POV_CHECK(off + 27 <= len, "truncated page header");
    const uint8_t* h = data + off;
    POV_CHECK(memcmp(h, "OggS", 4) == 0, "bad capture pattern");
    POV_CHECK(h[4] == 0, "bad stream structure version");
    uint8_t flags = h[5];
    int64_t granule;
    memcpy(&granule, h + 6, 8);
    uint32_t serial;
    memcpy(&serial, h + 14, 4);
    uint32_t expected_crc;
    memcpy(&expected_crc, h + 22, 4);
    int nseg = h[26];
    POV_CHECK(off + 27 + nseg <= len, "truncated segment table");
    const uint8_t* seg = h + 27;
    size_t data_len = 0;
    for (int i = 0; i < nseg; ++i) data_len += seg[i];
    const uint8_t* payload = seg + nseg;
    POV_CHECK(off + 27 + nseg + data_len <= len, "truncated page payload");

    uint8_t hdr_copy[27];
    memcpy(hdr_copy, h, 27);
    memset(hdr_copy + 22, 0, 4);
    uint32_t crc = pov::crc_update(0, hdr_copy, 27);
    crc = pov::crc_update(crc, seg, nseg);
    crc = pov::crc_update(crc, payload, data_len);
    POV_CHECK(crc == expected_crc, "page CRC mismatch");

    if (flags & 0x2) {  // BOS
      POV_CHECK(!streams.count(serial), "duplicate BOS");
      ScalarStream& ns = streams[serial];
      if (sinks) {  // one sink per logical stream, BOS order
        sinks->emplace_back(new PcmSink);
        ns.sink = sinks->back().get();
        auto it = final_granule.find(serial);
        if (it != final_granule.end()) {
          ns.reserve_hint = it->second;
          ns.reserve_total_cap = (int64_t)len * 64;
        }
      }
      if (dsink) {  // the caller's buffer holds exactly one stream
        POV_CHECK(!dsink->claimed, "pov-into: multi-stream blob");
        dsink->claimed = true;
        ns.dsink = dsink;
      }
      ns.cb = cb;  // one ParseCallbacks serves every logical stream
    }
    POV_CHECK(streams.count(serial), "page for unknown stream");
    ScalarStream& st = streams[serial];

    // cross-page packet reassembly (page-spanning packets; granule
    // attaches to the last packet completed on the page, RFC 3533)
    completed.clear();
    size_t poff = 0, plen = 0;
    bool first_run = true;
    for (int i = 0; i < nseg; ++i) {
      plen += seg[i];
      if (seg[i] < 255) {
        const uint8_t* pkt = payload + poff;
        size_t pkt_len = plen;
        if (first_run) {
          if (flags & 0x01) {
            POV_CHECK(st.has_pending, "continued page without a pending packet");
            assembled = std::move(st.pending);
            assembled.insert(assembled.end(), pkt, pkt + plen);
            st.pending.clear();
            st.has_pending = false;
            pkt = assembled.data();
            pkt_len = assembled.size();
          } else {
            POV_CHECK(!st.has_pending, "expected packet continuation page");
          }
          first_run = false;
        }
        completed.push_back(Pkt{pkt, pkt_len});
        poff += plen;
        plen = 0;
      }
    }
    if (plen > 0) {
      const uint8_t* tail = payload + poff;
      if (first_run) {
        if (flags & 0x01) {
          POV_CHECK(st.has_pending, "continued page without a pending packet");
        } else {
          POV_CHECK(!st.has_pending, "expected packet continuation page");
        }
        st.pending.insert(st.pending.end(), tail, tail + plen);
      } else {
        st.pending.assign(tail, tail + plen);
      }
      st.has_pending = true;
      POV_CHECK(st.pending.size() <= pov::kMaxPacket, "packet too large");
      poff += plen;
    } else if (nseg == 0 && !(flags & 0x01)) {
      POV_CHECK(!st.has_pending, "expected packet continuation page");
    }
    POV_CHECK(poff == data_len, "lacing/payload mismatch");
    for (size_t i = 0; i < completed.size(); ++i) {
      st.state.expected_ending = (i + 1 == completed.size()) ? granule : -1;
      if (st.packet_count < 3) {
        st.parse_headers_packet(completed[i].p, completed[i].len);
      } else {
        st.parse_audio(completed[i].p, completed[i].len);
        ++st.packet_count;
      }
    }

    if (flags & 0x4) {  // EOS
      POV_CHECK(!st.has_pending, "EOS page with incomplete packet");
      unregister_decoder_ref(&streams[serial]);
      streams.erase(serial);
      if (cb && !cb->gotEof()) throw StopParsing{};
    }
    off += 27 + nseg + data_len;
  }
  // remaining (non-EOS) streams unregister via the RAII cleanup
}

}  // namespace povsc

extern "C" {

static char g_error_buf[255];

int ogg_vorbis_full_read_from_memory(const char* data, size_t data_len,
                                     const char** error_out) {
  try {
    povsc::full_read((const uint8_t*)data, data_len);
    return 0;
  } catch (const pov::ParseError& e) {
    if (error_out) {
      strncpy(g_error_buf, e.msg.c_str(), sizeof(g_error_buf) - 1);
      g_error_buf[sizeof(g_error_buf) - 1] = 0;
      *error_out = g_error_buf;
    }
    return 1;
  } catch (const std::exception& e) {
    if (error_out) {
      strncpy(g_error_buf, e.what(), sizeof(g_error_buf) - 1);
      g_error_buf[sizeof(g_error_buf) - 1] = 0;
      *error_out = g_error_buf;
    }
    return 1;
  }
}

// ----- direct PCM consumer API (native host decode route) -----
// Decode a whole buffer and hand the PCM back as arrays — the product
// face of the scalar decoder (the dump path above is the debugging
// face).  One result handle per call; streams in BOS order.

struct PovPcmResult {
  std::vector<std::unique_ptr<povsc::PcmSink>> sinks;
};

void* pov_decode_pcm(const char* data, size_t data_len, char* err,
                     size_t err_len) {
  auto* res = new PovPcmResult;
  try {
    povsc::full_read((const uint8_t*)data, data_len, &res->sinks);
    return res;
  } catch (const pov::ParseError& e) {
    if (err && err_len) {
      strncpy(err, e.msg.c_str(), err_len - 1);
      err[err_len - 1] = 0;
    }
  } catch (const std::exception& e) {
    if (err && err_len) {
      strncpy(err, e.what(), err_len - 1);
      err[err_len - 1] = 0;
    }
  }
  delete res;
  return nullptr;
}

int32_t pov_pcm_num_streams(void* h) {
  return (int32_t)((PovPcmResult*)h)->sinks.size();
}

void pov_pcm_info(void* h, int32_t stream, int32_t* channels,
                  int64_t* samples, int32_t* rate) {
  const povsc::PcmSink& sk = *((PovPcmResult*)h)->sinks[stream];
  *channels = (int32_t)sk.chans.size();
  *samples = sk.chans.empty() ? 0 : (int64_t)sk.chans[0].size();
  *rate = (int32_t)sk.sample_rate;
}

void pov_pcm_get(void* h, int32_t stream, float* out) {
  const povsc::PcmSink& sk = *((PovPcmResult*)h)->sinks[stream];
  const int64_t n = sk.chans.empty() ? 0 : (int64_t)sk.chans[0].size();
  for (size_t c = 0; c < sk.chans.size(); ++c)
    memcpy(out + (int64_t)c * n, sk.chans[c].data(), sizeof(float) * n);
}

// Same copy-out with the framework's float->int16 PCM contract applied
// in-place (batch.pcm_f32_to_i16: round-half-to-even via np.round, then
// clamp).  rintf under the default FE_TONEAREST mode is the same
// half-to-even rounding, so the result is bit-identical to the numpy
// conversion of pov_pcm_get's floats (pinned in tests/test_native_capi.py)
// while halving the copy-out write traffic and keeping the conversion
// outside the GIL.  Clamping in FLOAT before the round (vs rounding then
// clamping the integer) is equivalent — every float > 32767.0f rounds
// > 32767 anyway (the nearest floats are 32767.002, 32768.0) and
// symmetrically for the low side — and it lets gcc vectorize the loop
// (vrndscaleps + vcvttps2dq at -O3 -march=native, 2.3x the scalar
// lrintf form; bit-equality of the two forms checked over 5.6M random
// samples + the .5/clamp corners before landing).
void pov_pcm_get_i16(void* h, int32_t stream, int16_t* out) {
  const povsc::PcmSink& sk = *((PovPcmResult*)h)->sinks[stream];
  const int64_t n = sk.chans.empty() ? 0 : (int64_t)sk.chans[0].size();
  for (size_t c = 0; c < sk.chans.size(); ++c)
    povsc::convert_pcm_i16(sk.chans[c].data(), out + (int64_t)c * n, n);
}

// Single-stream fast path: decode straight into the caller's
// [channels, cap] row-major buffer (int16 when as_i16, else float32) —
// no sink allocation/growth and no copy-out pass (the i16 conversion
// runs packet-sized and cache-hot at emit time).  The caller sizes the
// buffer from its own id-header + final-granule scan (the Python side's
// _scan_blob_meta, the same scan route=auto uses).  Returns emitted
// samples per channel; on failure returns -1 with the message in err —
// messages prefixed "pov-into:" (multi-stream blob, channel mismatch,
// overflow) mean "retry via pov_decode_pcm", anything else is the same
// parse error the handle API would raise.  A caller that gets back
// fewer samples than it sized for (truncated stream) should also fall
// back: the general API, not this one, defines partial-file behavior.
int64_t pov_decode_pcm_into(const char* data, size_t data_len,
                            int32_t as_i16, void* out, int32_t channels,
                            int64_t cap, char* err, size_t err_len) {
  povsc::DirectSink ds;
  ds.out = out;
  ds.cap = cap;
  ds.channels = channels;
  ds.i16 = as_i16 != 0;
  try {
    povsc::full_read((const uint8_t*)data, data_len, nullptr, nullptr, &ds);
    return ds.written;
  } catch (const pov::ParseError& e) {
    if (err && err_len) {
      strncpy(err, e.msg.c_str(), err_len - 1);
      err[err_len - 1] = 0;
    }
  } catch (const std::exception& e) {
    if (err && err_len) {
      strncpy(err, e.what(), err_len - 1);
      err[err_len - 1] = 0;
    }
  }
  return -1;
}

void pov_pcm_free(void* h) { delete (PovPcmResult*)h; }

// Raw Ogg CRC-32 (poly 0x04c11db7, non-reflected, init/xorout 0) over a
// buffer, chainable via `crc`.  Exported for the Python side's hot CRC
// consumers (the recovery scanner verifies every page; utils/crc.py is
// the portable per-byte fallback).
uint32_t pov_crc32(const uint8_t* data, int64_t len, uint32_t crc) {
  return pov::crc_update(crc, data, (size_t)len);
}

int ogg_vorbis_full_read(const char* filename, const char** error_out) {
  FILE* f = fopen(filename, "rb");
  if (!f) {
    if (error_out) {
      snprintf(g_error_buf, sizeof(g_error_buf), "cannot open %s", filename);
      *error_out = g_error_buf;
    }
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {  // unseekable input (pipe/FIFO): ftell returns -1 and
    // vector<char>(-1) would throw length_error across the C ABI
    fclose(f);
    if (error_out) {
      snprintf(g_error_buf, sizeof(g_error_buf), "cannot size %s", filename);
      *error_out = g_error_buf;
    }
    return 1;
  }
  std::vector<char> buf;
  try {
    buf.resize((size_t)size);
  } catch (const std::exception&) {
    fclose(f);
    if (error_out) {
      snprintf(g_error_buf, sizeof(g_error_buf), "cannot buffer %s",
               filename);
      *error_out = g_error_buf;
    }
    return 1;
  }
  size_t got = fread(buf.data(), 1, size, f);
  fclose(f);
  if ((long)got != size) {
    if (error_out) {
      snprintf(g_error_buf, sizeof(g_error_buf), "short read on %s", filename);
      *error_out = g_error_buf;
    }
    return 1;
  }
  return ogg_vorbis_full_read_from_memory(buf.data(), size, error_out);
}

}  // extern "C"

// ------------------- public C++ consumer API (pov.hpp) -------------------
// Same ScalarStream pipeline as the C faces above, driven per-packet into
// a ParseCallbacks subclass.  Mirrors the reference's embeddable surface
// (ParseOggVorbis.hpp:966-973, 1385-1485); a returned-false stop is clean.

namespace pov {

std::string OggReader::full_read_from_memory(const uint8_t* data, size_t len,
                                             ParseCallbacks& callbacks) {
  try {
    povsc::full_read(data, len, nullptr, &callbacks);
    return "";
  } catch (const povsc::StopParsing&) {
    return "";  // callback-requested stop: success by contract
  } catch (const pov::ParseError& e) {
    return e.msg;
  } catch (const std::exception& e) {
    return e.what();
  }
}

std::string OggReader::full_read(const char* filename,
                                 ParseCallbacks& callbacks) {
  FILE* f = fopen(filename, "rb");
  if (!f) return std::string("cannot open ") + filename;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {  // unseekable input (pipe/FIFO)
    fclose(f);
    return std::string("cannot size ") + filename;
  }
  std::vector<uint8_t> buf;
  try {
    buf.resize((size_t)size);
  } catch (const std::exception&) {
    fclose(f);
    return std::string("cannot buffer ") + filename;
  }
  size_t got = fread(buf.data(), 1, size, f);
  fclose(f);
  if ((long)got != size) return std::string("short read on ") + filename;
  return full_read_from_memory(buf.data(), buf.size(), callbacks);
}

}  // namespace pov

// Public C++ consumer API: stream an Ogg Vorbis decode through callbacks.
//
// The same-language equivalent of the reference's embeddable surface
// (ParseCallbacks at /root/reference/src/ParseOggVorbis.hpp:966-973 and
// OggReader::full_read at :1385-1485): a C++ program subclasses
// pov::ParseCallbacks and drives pov::OggReader to receive header,
// comments, setup and per-packet PCM in-process, with no dump channel
// and no bulk-decode detour.  Contract notes:
//
//  * Any callback may return false to stop parsing; the stop is CLEAN
//    (full_read returns success), matching this framework's Python
//    ParseCallbacks (runtime/decoder.py) — the reference instead fails
//    its surrounding CHECK, turning a requested stop into an error.
//  * gotPcmData hands borrowed per-channel ranges into the decoder's
//    overlap-add buffer — valid only for the duration of the call, copy
//    to keep (same lifetime rule as the reference's DataRange).
//  * One ParseCallbacks serves the whole physical stream; chained /
//    multiplexed files deliver every logical stream's callbacks in page
//    order, gotEof once per EOS (reference: ParseOggVorbis.hpp:1478-1481).
//  * Errors come back as a message string (empty = success); the decode
//    itself enforces the strict reference semantics (CRC, framing).
//
// Link against the framework's native library (_libpov.so) or compile
// native/pov_capi.cpp into the consumer directly — see
// native/example_consumer.cpp, built and run by tests/test_cpp_consumer.py.
#pragma once

#include <cstddef>
#include <cstdint>
#include <string>
#include <vector>

namespace pov {

// Vorbis identification header (spec 4.2.2), as delivered to gotHeader.
struct IdHeaderInfo {
  uint32_t vorbis_version = 0;
  int channels = 0;
  uint32_t sample_rate = 0;
  int32_t bitrate_maximum = 0;
  int32_t bitrate_nominal = 0;
  int32_t bitrate_minimum = 0;
  int blocksize_0 = 0;  // short block length (64..8192, pow2)
  int blocksize_1 = 0;  // long block length
};

// Setup-header summary, as delivered to gotSetup (the full parsed tables
// stay internal; these counts mirror what the reference demo prints).
struct SetupInfo {
  int num_codebooks = 0;
  int num_floors = 0;
  int num_residues = 0;
  int num_mappings = 0;
  int num_modes = 0;
};

// Borrowed view of one channel's emitted PCM (float32, [-1, 1]).
struct PcmRange {
  const float* data = nullptr;
  size_t size = 0;
};

struct ParseCallbacks {
  virtual ~ParseCallbacks() {}
  // Return false from any hook to stop parsing (clean stop).
  virtual bool gotHeader(const IdHeaderInfo& header) {
    (void)header;
    return true;
  }
  virtual bool gotComments(const std::string& vendor,
                           const std::vector<std::string>& comments) {
    (void)vendor;
    (void)comments;
    return true;
  }
  virtual bool gotSetup(const SetupInfo& setup) {
    (void)setup;
    return true;
  }
  // One call per emitted packet-worth of samples: channelPcms[ch] views
  // the decoder's buffer for the duration of the call.
  virtual bool gotPcmData(const std::vector<PcmRange>& channelPcms) {
    (void)channelPcms;
    return true;
  }
  // Called at each logical stream's EOS page.
  virtual bool gotEof() { return true; }
};

class OggReader {
 public:
  // Decode a whole file / memory buffer, driving the callbacks.
  // Returns "" on success (including a callback-requested stop), else
  // the parse error message (strict reference semantics: CRC mismatch,
  // bad framing, truncated pages all fail the read).
  std::string full_read(const char* filename, ParseCallbacks& callbacks);
  std::string full_read_from_memory(const uint8_t* data, size_t len,
                                    ParseCallbacks& callbacks);
};

}  // namespace pov

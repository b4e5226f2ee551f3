// Example C++ consumer of the public callback API (pov.hpp) — the
// embeddable usage the reference demonstrates with its demo main
// (/root/reference/src/main.cpp:14-67 over ParseOggVorbis.hpp:966-973):
// subclass pov::ParseCallbacks, drive pov::OggReader::full_read, receive
// header/comments/setup/PCM in-process.
//
// Build (also done by tests/test_cpp_consumer.py in CI):
//   g++ -std=c++17 -O2 native/example_consumer.cpp native/pov_capi.cpp
//       -o consumer_example  (one line)
// Usage:
//   ./consumer_example file.ogg [stop_after_samples]
//
// Prints one summary line per callback kind; with stop_after_samples the
// consumer returns false from gotPcmData once that many samples arrived,
// demonstrating the clean early stop.

#include <cinttypes>
#include <cstdio>
#include <cstdlib>

#include "pov.hpp"

namespace {

struct PrintingConsumer : pov::ParseCallbacks {
  uint64_t samples = 0;
  uint64_t pcm_calls = 0;
  uint64_t stop_after;  // 0 = never stop

  explicit PrintingConsumer(uint64_t stop) : stop_after(stop) {}

  bool gotHeader(const pov::IdHeaderInfo& h) override {
    printf("header: %d ch, %u Hz, blocksizes %d/%d, nominal bitrate %d\n",
           h.channels, h.sample_rate, h.blocksize_0, h.blocksize_1,
           h.bitrate_nominal);
    return true;
  }

  bool gotComments(const std::string& vendor,
                   const std::vector<std::string>& comments) override {
    printf("comments: vendor \"%s\", %zu user comments\n", vendor.c_str(),
           comments.size());
    return true;
  }

  bool gotSetup(const pov::SetupInfo& s) override {
    printf("setup: %d codebooks, %d floors, %d residues, %d modes\n",
           s.num_codebooks, s.num_floors, s.num_residues, s.num_modes);
    return true;
  }

  bool gotPcmData(const std::vector<pov::PcmRange>& channelPcms) override {
    ++pcm_calls;
    if (!channelPcms.empty()) samples += channelPcms[0].size;
    return stop_after == 0 || samples < stop_after;
  }

  bool gotEof() override {
    printf("eof\n");
    return true;
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s file.ogg [stop_after_samples]\n", argv[0]);
    return 2;
  }
  PrintingConsumer consumer(argc > 2 ? strtoull(argv[2], nullptr, 10) : 0);
  pov::OggReader reader;
  std::string err = reader.full_read(argv[1], consumer);
  if (!err.empty()) {
    fprintf(stderr, "error: %s\n", err.c_str());
    return 1;
  }
  printf("pcm: %" PRIu64 " samples per channel in %" PRIu64 " callbacks\n",
         consumer.samples, consumer.pcm_calls);
  return 0;
}

// pov_main.cpp — native demo decoder binary, same CLI contract as the
// reference (`--in f.ogg [--debug_out dump] [--debug_stdout] [--help]`),
// so it can stand in for `ours.bin` in the differential compare harness.

#include <cstdio>
#include <cstring>
#include <string>

extern "C" {
int ogg_vorbis_full_read(const char* filename, const char** error_out);
void set_data_output_file(const char* fn);
void set_data_output_short_stdout(void);
}

static void print_usage(const char* argv0) {
  printf("%s --in ogg_filename [--help] [--debug_out filename] [--debug_stdout]\n",
         argv0);
}

int main(int argc, const char** argv) {
  std::string ogg;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--help")) {
      print_usage(argv[0]);
      return 1;
    } else if (!strcmp(argv[i], "--in")) {
      if (++i >= argc) {
        fprintf(stderr, "missing arg after --in\n");
        print_usage(argv[0]);
        return 1;
      }
      ogg = argv[i];
    } else if (!strcmp(argv[i], "--debug_out")) {
      if (++i >= argc) {
        fprintf(stderr, "missing arg after --debug_out\n");
        print_usage(argv[0]);
        return 1;
      }
      set_data_output_file(argv[i]);
    } else if (!strcmp(argv[i], "--debug_stdout")) {
      set_data_output_short_stdout();
    } else {
      fprintf(stderr, "unexpected arg %d \"%s\"\n", i, argv[i]);
      print_usage(argv[0]);
      return 1;
    }
  }
  if (ogg.empty()) {
    fprintf(stderr, "need to provide --in ogg_filename\n");
    print_usage(argv[0]);
    return 1;
  }
  const char* err = nullptr;
  if (ogg_vorbis_full_read(ogg.c_str(), &err)) {
    fprintf(stderr, "error: %s\n", err ? err : "unknown");
    return 1;
  }
  printf("ok\n");
  return 0;
}

// Diagnostic oracle for parakeet parity: runs the reference pipeline from
// either raw pcm (f32le) or an externally computed mel (f32, time-major),
// printing the transcription.  Build:
//   g++ -O2 tools/oracle/parakeet_oracle.cpp -I/root/reference/include \
//       -I/root/reference/ggml/include -L.oracle/build/bin -lparakeet \
//       -o .oracle/parakeet_oracle -Wl,-rpath,/root/repo/.oracle/build/bin
// Usage:
//   parakeet_oracle MODEL pcm PCM.f32
//   parakeet_oracle MODEL mel MEL.f32 N_LEN N_MEL

#include "parakeet.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static std::vector<float> read_f32(const char * path) {
    FILE * f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<float> v(sz / sizeof(float));
    if (fread(v.data(), sizeof(float), v.size(), f) != v.size()) exit(1);
    fclose(f);
    return v;
}

int main(int argc, char ** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s MODEL pcm|mel FILE [N_LEN N_MEL]\n", argv[0]); return 1; }

    parakeet_context_params cparams = parakeet_context_default_params();
    parakeet_context * ctx = parakeet_init_from_file_with_params(argv[1], cparams);
    if (!ctx) return 1;

    parakeet_full_params fparams = parakeet_full_default_params(PARAKEET_SAMPLING_GREEDY);
    fparams.n_threads = 4;

    if (strcmp(argv[2], "pcm") == 0) {
        std::vector<float> pcm = read_f32(argv[3]);
        if (parakeet_full(ctx, fparams, pcm.data(), pcm.size()) != 0) return 1;
    } else {
        std::vector<float> mel = read_f32(argv[3]);
        const int n_len = atoi(argv[4]);
        const int n_mel = atoi(argv[5]);
        if (parakeet_set_mel(ctx, mel.data(), n_len, n_mel) != 0) return 1;
        if (parakeet_full(ctx, fparams, nullptr, 0) != 0) return 1;
    }

    const int n_seg = parakeet_full_n_segments(ctx);
    for (int i = 0; i < n_seg; i++) {
        printf("%s", parakeet_full_get_segment_text(ctx, i));
    }
    printf("\n");
    parakeet_free(ctx);
    return 0;
}

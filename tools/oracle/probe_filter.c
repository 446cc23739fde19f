// dump FULL filtered logits per decode step via logits_filter_callback
// (whisper.h:585-591): records [n_toks:int32][logits:f32 x n_vocab] per
// step to argv[3].  Greedy -nf -bo 1 -bs 1 "en" params, matching
// tools/make_text_refs.py's statistical-tier invocation.  Align this
// stream with the engine's params.logits_filter_callback capture to find
// the FIRST diverging step and its margins (docs/VERIFICATION.md seed-27
// root cause; usage pattern in round-5 history).
#include "whisper.h"
#include <stdio.h>
#include <stdlib.h>
static FILE * out;
static void cb(struct whisper_context * c, struct whisper_state * s,
               const whisper_token_data * toks, int n_toks,
               float * logits, void * ud) {
    int nv = whisper_n_vocab(c);
    fwrite(&n_toks, 4, 1, out);
    fwrite(logits, 4, nv, out);
}
int main(int argc, char ** argv) {
    struct whisper_context_params cp = whisper_context_default_params();
    cp.use_gpu = false;
    struct whisper_context * ctx = whisper_init_from_file_with_params(argv[1], cp);
    FILE * f = fopen(argv[2], "rb");
    fseek(f, 0, SEEK_END); long n = ftell(f) / 4; fseek(f, 0, SEEK_SET);
    float * pcm = malloc(n * 4); fread(pcm, 4, n, f); fclose(f);
    out = fopen(argv[3], "wb");
    struct whisper_full_params p = whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    p.print_progress = false; p.print_realtime = false;
    p.temperature_inc = 0.0f; p.greedy.best_of = 1;
    p.beam_search.beam_size = 1; p.language = "en";
    p.logits_filter_callback = cb;
    whisper_full(ctx, p, pcm, (int) n);
    fclose(out); whisper_free(ctx);
    return 0;
}

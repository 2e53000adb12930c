/* Native CLI over the C ABI shim — the drop-in analog of the reference's
 * examples/main binary (examples/main/main.cpp:353-594): load model, load
 * WAV, run whisper_full N times, print the encoder fingerprint each
 * iteration and total elapsed time.
 *
 * Usage: qa_main <model.bin> <audio.wav> [iters]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef void whisper_context;
extern whisper_context* whisper_init_from_file(const char* path);
extern void whisper_free(whisper_context*);
extern int whisper_full(whisper_context*, void*, const float*, int);
extern void whisper_print_emb_enc(whisper_context*);
extern void whisper_print_timings(whisper_context*);
extern int whisper_n_vocab(whisper_context*);

/* from libqa_native (linked transitively is not guaranteed; re-declare) */
extern int qa_wav_read(const char* path, float** out, long long* n, int* rate);
extern void qa_free(void* p);

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <model.bin> <audio.wav> [iters]\n", argv[0]);
        return 1;
    }
    const char* model = argv[1];
    const char* wav = argv[2];
    int iters = argc > 3 ? atoi(argv[3]) : 100;

    whisper_context* ctx = whisper_init_from_file(model);
    if (!ctx) {
        fprintf(stderr, "failed to load model %s\n", model);
        return 2;
    }
    fprintf(stderr, "model loaded: n_vocab=%d\n", whisper_n_vocab(ctx));

    /* minimal reader for CANONICAL 16-bit PCM mono WAVs (44-byte header);
     * anything else should go through libqa_native's qa_wav_read */
    FILE* f = fopen(wav, "rb");
    if (!f) { fprintf(stderr, "no wav %s\n", wav); return 3; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    if (size <= 44) { fprintf(stderr, "wav too short: %s\n", wav); fclose(f); return 3; }
    unsigned char hdr[44];
    fseek(f, 0, SEEK_SET);
    if (fread(hdr, 1, 44, f) != 44 || memcmp(hdr, "RIFF", 4) != 0
        || memcmp(hdr + 8, "WAVE", 4) != 0 || memcmp(hdr + 36, "data", 4) != 0
        || hdr[20] != 1 /* PCM */ || hdr[22] != 1 /* mono */
        || hdr[34] != 16 /* bits */) {
        fprintf(stderr, "not a canonical 16-bit mono PCM wav: %s\n", wav);
        fclose(f);
        return 3;
    }
    long n = (size - 44) / 2;
    short* pcm = malloc((size_t)n * 2);
    float* samples = malloc((size_t)n * 4);
    if (!pcm || !samples) { fclose(f); free(pcm); free(samples); return 3; }
    if (fread(pcm, 2, (size_t)n, f) != (size_t)n) {
        fclose(f); free(pcm); free(samples); return 3;
    }
    fclose(f);
    for (long i = 0; i < n; i++) samples[i] = pcm[i] / 32768.0f;
    free(pcm);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int i = 0; i < iters; i++) {
        if (whisper_full(ctx, NULL, samples, (int)n) != 0) {
            fprintf(stderr, "whisper_full failed\n");
            return 4;
        }
        whisper_print_emb_enc(ctx);
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) / 1e9;
    printf("Elapsed time is %.6f seconds.\n", dt);
    whisper_print_timings(ctx);

    free(samples);
    whisper_free(ctx);
    return 0;
}

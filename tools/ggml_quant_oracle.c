/* Quant-codec oracle against the REFERENCE ggml quantizers.
 *
 * Links the reference's own libggml (built CPU-only from /root/reference)
 * plus a strict-FP (-ffp-contract=off -fno-tree-vectorize) object of
 * ggml-quants.c, and exposes quantizer + dequantizer for one tensor type:
 *
 *   ggml_quant_oracle <ggml_type_int> <n_elements> <in.f32> \
 *                     <out.quant> <out.deq.f32>
 *
 * - legacy formats quantize via ggml_quantize_chunk (the exact code path
 *   of examples/common-ggml.cpp:191; elementwise, build-invariant)
 * - k-quants call quantize_row_{q4,q6}_K_ref DIRECTLY from the strict-FP
 *   object: their scale search carries sequential f32 reductions that
 *   ggml's own -O2/native builds reassociate machine-dependently, so the
 *   C source semantics (sequential f32) is the canonical target
 * - dequantizes the result with the type's to_float trait
 *   (dequantize_row_*, ggml/src/ggml-quants.c; contraction-safe)
 *
 * tools/crosscheck_ggml.py --codec-oracle builds this and diffs both
 * outputs against quant/codecs.py — payload bytes and dequantized values
 * must be bit-identical for every format.
 */
#include <stdio.h>
#include <stdlib.h>

#include "ggml.h"

/* strict-FP object (ggml-quants.c compiled -ffp-contract=off) */
void quantize_row_q2_K_ref(const float *x, void *y, int64_t k);
void quantize_row_q3_K_ref(const float *x, void *y, int64_t k);
void quantize_row_q4_K_ref(const float *x, void *y, int64_t k);
void quantize_row_q5_K_ref(const float *x, void *y, int64_t k);
void quantize_row_q6_K_ref(const float *x, void *y, int64_t k);

int main(int argc, char **argv) {
    if (argc != 6) {
        fprintf(stderr, "usage: %s <type> <n> <in.f32> <out.q> <out.f32>\n",
                argv[0]);
        return 2;
    }
    const enum ggml_type type = (enum ggml_type) atoi(argv[1]);
    const long n = atol(argv[2]);

    /* ggml_init builds the global f16<->f32 lookup tables that the
     * dequantize_row_* kernels read; without it to_float returns garbage */
    struct ggml_init_params ip = { 1 << 20, NULL, 1 };
    struct ggml_context *ctx = ggml_init(ip);
    (void) ctx;

    float *src = malloc(n * sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    if (!f || fread(src, sizeof(float), n, f) != (size_t) n) {
        fprintf(stderr, "failed to read %ld floats from %s\n", n, argv[3]);
        return 3;
    }
    fclose(f);

    const size_t row_size = ggml_row_size(type, n);
    void *q = malloc(row_size);
    if (type == GGML_TYPE_Q2_K) {
        quantize_row_q2_K_ref(src, q, n);
    } else if (type == GGML_TYPE_Q3_K) {
        quantize_row_q3_K_ref(src, q, n);
    } else if (type == GGML_TYPE_Q4_K) {
        quantize_row_q4_K_ref(src, q, n);
    } else if (type == GGML_TYPE_Q5_K) {
        quantize_row_q5_K_ref(src, q, n);
    } else if (type == GGML_TYPE_Q6_K) {
        quantize_row_q6_K_ref(src, q, n);
    } else {
        const size_t written =
            ggml_quantize_chunk(type, src, q, 0, 1, n, NULL);
        if (written != row_size) {
            fprintf(stderr, "quantize_chunk wrote %zu, expected %zu\n",
                    written, row_size);
            return 4;
        }
    }

    float *deq = malloc(n * sizeof(float));
    ggml_internal_get_type_traits(type).to_float(q, deq, n);

    f = fopen(argv[4], "wb");
    fwrite(q, 1, row_size, f);
    fclose(f);
    f = fopen(argv[5], "wb");
    fwrite(deq, sizeof(float), n, f);
    fclose(f);

    printf("%zu\n", row_size);
    free(src); free(q); free(deq);
    return 0;
}

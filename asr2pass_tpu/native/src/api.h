/* C ABI for the asr2pass_tpu native host library.
 *
 * Native equivalents of the reference's CPU-bound host pieces:
 *  - LinearResample  (onnxruntime/src/resample.cpp role)
 *  - Aho-Corasick hotword bias automaton (bias-lm.cpp role: prefix tree +
 *    failure arcs carrying negative back-off scores, consulted per symbol)
 *  - Levenshtein alignment (utils/compute-wer.py Calculator + the
 *    TimestampSmooth edit-distance backbone, util.cpp:415-462)
 *
 * All functions are plain C so Python binds via ctypes (no pybind11).
 */
#ifndef ASR2PASS_NATIVE_API_H
#define ASR2PASS_NATIVE_API_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- resampler ---- */
/* Returns number of output samples written to out (caller allocates
 * ceil(n_in * fs_out / fs_in) + 16). */
int64_t a2p_resample(const float* in, int64_t n_in, int fs_in, int fs_out,
                     int num_zeros, float* out);

/* ---- Aho-Corasick bias automaton over int32 symbol ids ---- */
typedef struct A2pAcBias A2pAcBias;

/* words: concatenated symbol ids; word_lens[n_words]; scores per word
 * (boost per symbol). */
A2pAcBias* a2p_ac_build(const int32_t* symbols, const int32_t* word_lens,
                        const float* per_symbol_scores, int32_t n_words);
void a2p_ac_free(A2pAcBias* ac);
/* Step: state in/out, returns score delta (negative on retraction). */
float a2p_ac_step(const A2pAcBias* ac, int32_t* state, int32_t symbol);
/* Final retraction for a dangling partial match. */
float a2p_ac_final(const A2pAcBias* ac, int32_t state);

/* ---- Levenshtein alignment ---- */
/* a[n], b[m] are int32 symbol ids. ops_out must hold n+m entries.
 * Writes alignment ops: 0=match, 1=substitute, 2=delete(a only),
 * 3=insert(b only). Returns op count; distance written to *dist. */
int64_t a2p_edit_align(const int32_t* a, int64_t n, const int32_t* b,
                       int64_t m, int32_t* ops_out, int32_t* dist);

#ifdef __cplusplus
}
#endif
#endif

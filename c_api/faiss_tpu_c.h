/* faiss_tpu C API — analogue of the reference's c_api/ (Index_c.h,
 * index_factory_c.h, index_io_c.h: opaque-pointer style, int error codes,
 * faiss_get_last_error). The implementation embeds the Python engine; C
 * callers never see Python objects.
 *
 * Usage:
 *   faiss_tpu_init(NULL);
 *   FaissTpuIndex* idx = NULL;
 *   faiss_tpu_index_factory(&idx, 64, "IVF64,PQ8", FAISS_TPU_METRIC_L2);
 *   faiss_tpu_Index_train(idx, n, xt);
 *   faiss_tpu_Index_add(idx, n, xb);
 *   faiss_tpu_Index_search(idx, nq, xq, 10, D, I);
 *   faiss_tpu_Index_free(idx);
 *
 * All functions return 0 on success, -1 on error (message via
 * faiss_tpu_get_last_error). Thread-safety: calls serialize on the
 * embedded interpreter's GIL.
 */

#ifndef FAISS_TPU_C_H
#define FAISS_TPU_C_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct FaissTpuIndex FaissTpuIndex; /* opaque */
typedef int64_t faiss_tpu_idx_t;

enum {
    FAISS_TPU_METRIC_INNER_PRODUCT = 0,
    FAISS_TPU_METRIC_L2 = 1,
};

/* interpreter lifecycle; repo_path may be NULL (installed package) */
int faiss_tpu_init(const char* repo_path);
void faiss_tpu_shutdown(void);
const char* faiss_tpu_get_last_error(void);

/* construction */
int faiss_tpu_index_factory(
        FaissTpuIndex** out,
        int d,
        const char* description,
        int metric);
void faiss_tpu_Index_free(FaissTpuIndex* index);

/* properties */
faiss_tpu_idx_t faiss_tpu_Index_ntotal(const FaissTpuIndex* index);
int faiss_tpu_Index_d(const FaissTpuIndex* index);
int faiss_tpu_Index_is_trained(const FaissTpuIndex* index);

/* core ops (Index_c.h parity) */
int faiss_tpu_Index_train(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x);
int faiss_tpu_Index_add(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x);
int faiss_tpu_Index_add_with_ids(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x,
        const faiss_tpu_idx_t* ids);
int faiss_tpu_Index_search(
        const FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x,
        faiss_tpu_idx_t k,
        float* distances,
        faiss_tpu_idx_t* labels);
int faiss_tpu_Index_reset(FaissTpuIndex* index);
int faiss_tpu_Index_reconstruct(
        const FaissTpuIndex* index,
        faiss_tpu_idx_t key,
        float* recons);

/* runtime parameters (ParameterSpace::set_index_parameter analogue) */
int faiss_tpu_Index_set_parameter(
        FaissTpuIndex* index,
        const char* name,
        double value);

/* io (index_io_c.h parity) */
int faiss_tpu_write_index(const FaissTpuIndex* index, const char* fname);
int faiss_tpu_read_index(
        FaissTpuIndex** out,
        const char* fname,
        int io_flags);

#ifdef __cplusplus
}
#endif

#endif /* FAISS_TPU_C_H */

/* C API smoke example (the reference's c_api example_c analogue):
 * build an IVF-PQ index from C, search it, round-trip through a file. */

#include "faiss_tpu_c.h"

#include <stdio.h>
#include <stdlib.h>

#define CHECK(call)                                                   \
    do {                                                              \
        if ((call) != 0) {                                            \
            fprintf(stderr,                                           \
                    "FAIL %s: %s\n",                                  \
                    #call,                                            \
                    faiss_tpu_get_last_error());                      \
            return 1;                                                 \
        }                                                             \
    } while (0)

int main(int argc, char** argv) {
    const char* repo = argc > 1 ? argv[1] : NULL;
    int d = 32;
    long long nb = 4000, nq = 10, k = 5;

    CHECK(faiss_tpu_init(repo));

    float* xb = malloc(nb * d * sizeof(float));
    float* xq = malloc(nq * d * sizeof(float));
    srand(123);
    for (long long i = 0; i < nb * d; i++) {
        xb[i] = (float)rand() / RAND_MAX;
    }
    for (long long i = 0; i < nq * d; i++) {
        xq[i] = xb[i]; /* queries = first db rows: NN must be identity */
    }

    FaissTpuIndex* index = NULL;
    CHECK(faiss_tpu_index_factory(
            &index, d, "IVF16,Flat", FAISS_TPU_METRIC_L2));
    CHECK(faiss_tpu_Index_train(index, nb, xb));
    CHECK(faiss_tpu_Index_add(index, nb, xb));
    printf("ntotal=%lld trained=%d\n",
           (long long)faiss_tpu_Index_ntotal(index),
           faiss_tpu_Index_is_trained(index));

    CHECK(faiss_tpu_Index_set_parameter(index, "nprobe", 16));

    float* D = malloc(nq * k * sizeof(float));
    faiss_tpu_idx_t* I = malloc(nq * k * sizeof(faiss_tpu_idx_t));
    CHECK(faiss_tpu_Index_search(index, nq, xq, k, D, I));
    int ok = 1;
    for (long long q = 0; q < nq; q++) {
        if (I[q * k] != q || D[q * k] > 1e-4f) {
            ok = 0;
        }
        printf("q%lld -> id %lld dist %.4f\n",
               q,
               (long long)I[q * k],
               D[q * k]);
    }

    /* io round trip */
    CHECK(faiss_tpu_write_index(index, "/tmp/c_api_index.npz"));
    FaissTpuIndex* loaded = NULL;
    CHECK(faiss_tpu_read_index(&loaded, "/tmp/c_api_index.npz", 0));
    printf("reloaded ntotal=%lld\n",
           (long long)faiss_tpu_Index_ntotal(loaded));
    float* D2 = malloc(nq * k * sizeof(float));
    faiss_tpu_idx_t* I2 = malloc(nq * k * sizeof(faiss_tpu_idx_t));
    CHECK(faiss_tpu_Index_set_parameter(loaded, "nprobe", 16));
    CHECK(faiss_tpu_Index_search(loaded, nq, xq, k, D2, I2));
    for (long long i = 0; i < nq * k; i++) {
        if (I[i] != I2[i]) {
            ok = 0;
        }
    }

    /* error path: mismatched description must set an error */
    FaissTpuIndex* bad = NULL;
    if (faiss_tpu_index_factory(&bad, d, "NotAnIndex", 1) == 0) {
        printf("expected factory error\n");
        ok = 0;
    } else {
        printf("factory error correctly reported: %.60s\n",
               faiss_tpu_get_last_error());
    }

    faiss_tpu_Index_free(index);
    faiss_tpu_Index_free(loaded);
    printf(ok ? "C API EXAMPLE: OK\n" : "C API EXAMPLE: FAILED\n");
    return ok ? 0 : 2;
}

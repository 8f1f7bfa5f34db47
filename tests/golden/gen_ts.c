/* Golden generator for temporal (time-series) streams, linked against the
 * reference libSZ.so.  Produces ts_step<i>.sz frames + ts_step<i>.out
 * decompressed snapshots for a synthetic evolving 1D float field.
 *
 * Build:
 *   cc tests/golden/gen_ts.c -I/root/reference/sz/include \
 *      -L/tmp/szref/build/sz -lSZ -L/tmp/szref/build/zstd -lzstd \
 *      -Wl,-rpath,/tmp/szref/build/sz -Wl,-rpath,/tmp/szref/build/zstd \
 *      -o /tmp/gen_ts -lm
 *   cd tests/golden && /tmp/gen_ts
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "sz.h"

#define N 4096
#define STEPS 5

int main(void) {
    SZ_Init(NULL);
    confparams_cpr->szMode = SZ_TEMPORAL_COMPRESSION;
    confparams_cpr->snapshotCmprStep = 3;

    static float data[N];
    for (int i = 0; i < N; i++)
        data[i] = sinf(i * 0.01f) + 0.3f * cosf(i * 0.037f);

    SZ_registerVar(1, "v", SZ_FLOAT, data, ABS, 1e-4, 0, 0,
                   0, 0, 0, 0, N);

    for (int s = 0; s < STEPS; s++) {
        /* evolve the field slightly */
        if (s > 0)
            for (int i = 0; i < N; i++)
                data[i] += 1e-3f * sinf(i * 0.01f + s);
        unsigned char *bytes = NULL;
        size_t outSize = 0;
        SZ_compress_ts(SZ_PERIO_TEMPORAL_COMPRESSION, &bytes, &outSize);
        char fn[64];
        snprintf(fn, sizeof fn, "ts_step%d.sz", s);
        FILE *f = fopen(fn, "wb");
        fwrite(bytes, 1, outSize, f);
        fclose(f);
        /* decompressed snapshot via the library's own ts decode is the
         * hist_data after compression (identical to decode) */
        SZ_Variable *v = SZ_getVariable(1);
        snprintf(fn, sizeof fn, "ts_step%d.out", s);
        f = fopen(fn, "wb");
        fwrite(v->multisteps->hist_data, sizeof(float), N, f);
        fclose(f);
        /* also dump the original input of this step */
        snprintf(fn, sizeof fn, "ts_step%d.in", s);
        f = fopen(fn, "wb");
        fwrite(data, sizeof(float), N, f);
        fclose(f);
        free(bytes);
    }
    SZ_Finalize();
    return 0;
}

/* Native host-side occupancy-map preprocessing.
 *
 * The reference delegates its map pipeline to native third-party code —
 * PIL's C decoder and skimage's Cython connected-components
 * (reference: map.py:61, 113-114).  This is the framework's own native
 * data-loader stage: binarization and 8-connectivity small-hole removal
 * over raw image bytes, bound to Python via ctypes
 * (multi_purpose_mpc_tpu/utils/native.py), with a scipy fallback when no
 * compiler is available.
 *
 * Build: cc -O3 -shared -fPIC -o libmapops.so mapops.c   (see Makefile)
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Binarize the red channel: 1 = free (>= threshold), 0 = occupied.
 * (reference semantics: map.py:110) */
void binarize_u8(const uint8_t *img, int8_t *out, long n, int threshold) {
  for (long i = 0; i < n; ++i) {
    out[i] = img[i] >= threshold ? 1 : 0;
  }
}

/* Fill 8-connected occupied components smaller than area_threshold.
 *
 * grid: h*w int8, 1 = free, 0 = occupied (modified in place).
 * Equivalent of skimage.morphology.remove_small_holes(grid, thr, 8) on a
 * 1=free grid: occupied speckles with area < area_threshold become free
 * (reference: map.py:113-114).
 *
 * Iterative flood fill with an explicit stack; visited cells are marked in
 * a scratch buffer so each cell is processed once: O(h*w).
 */
void remove_small_holes_i8(int8_t *grid, int h, int w, int area_threshold) {
  long n = (long)h * w;
  uint8_t *visited = (uint8_t *)calloc(n, 1);
  long *stack = (long *)malloc(n * sizeof(long));
  long *component = (long *)malloc(n * sizeof(long));
  if (!visited || !stack || !component) {
    free(visited);
    free(stack);
    free(component);
    return;
  }

  static const int dx[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
  static const int dy[8] = {-1, -1, -1, 0, 0, 1, 1, 1};

  for (long start = 0; start < n; ++start) {
    if (grid[start] != 0 || visited[start]) continue;

    long sp = 0, csize = 0;
    stack[sp++] = start;
    visited[start] = 1;
    while (sp > 0) {
      long idx = stack[--sp];
      component[csize++] = idx;
      int y = (int)(idx / w), x = (int)(idx % w);
      for (int k = 0; k < 8; ++k) {
        int nx = x + dx[k], ny = y + dy[k];
        if (nx < 0 || nx >= w || ny < 0 || ny >= h) continue;
        long nidx = (long)ny * w + nx;
        if (grid[nidx] == 0 && !visited[nidx]) {
          visited[nidx] = 1;
          stack[sp++] = nidx;
        }
      }
    }
    if (csize < area_threshold) {
      for (long i = 0; i < csize; ++i) grid[component[i]] = 1;
    }
  }

  free(visited);
  free(stack);
  free(component);
}

/* Fused pipeline: raw channel bytes -> clean binary grid. */
void preprocess_map_u8(const uint8_t *img, int8_t *out, int h, int w,
                       int threshold, int area_threshold) {
  binarize_u8(img, out, (long)h * w, threshold);
  remove_small_holes_i8(out, h, w, area_threshold);
}

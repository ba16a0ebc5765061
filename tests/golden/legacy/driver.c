/* Golden-generation driver for the reference legacy kernels.
 *
 * Compiles UNMODIFIED copies of /root/reference/old/parallel_convolution.c
 * and /root/reference/old/parallel_to_grayscale.c (their missing utils.h
 * supplied alongside) and runs them on a raw RGB input, writing raw
 * little-endian int32 outputs. generate.py orchestrates the build and
 * wraps the results into legacy_golden.npz for tests/test_golden_parity.py.
 *
 * Usage: driver <input.raw> <conv_out.raw> <gray_out.raw> <minmax_out.raw>
 *   input.raw:  DIM_ROW*DIM_COL*3 bytes, row-major RGB u8
 *   conv_out:   DIM_ROW*DIM_COL*3 int32 — both convolutions back to back:
 *               first the 1-2-1 Gaussian (GBLUR taps), then an asymmetric
 *               1..9 kernel that pins tap ORIENTATION (a symmetric kernel
 *               alone cannot distinguish correlation from convolution).
 *   gray_out:   DIM_ROW*DIM_COL*3 int32 (channel-mean gray, 3 planes)
 *   minmax_out: 2 int32 (min, max)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "utils.h"

void parallel_convolution(long img[DIM_ROW + PAD][DIM_COL + PAD][DIM_RGB],
                          long kernel[DIM_KERNEL][DIM_KERNEL],
                          long ***convolved_img);
void parallel_to_grayscale(long img[DIM_ROW][DIM_COL][DIM_RGB],
                           long ***grayscale_img, long *min_max_gray);

static long ***alloc3(int rows, int cols, int ch) {
    long ***a = malloc(rows * sizeof(long **));
    for (int r = 0; r < rows; r++) {
        a[r] = malloc(cols * sizeof(long *));
        for (int c = 0; c < cols; c++)
            a[r][c] = calloc(ch, sizeof(long));
    }
    return a;
}

static void write3(FILE *f, long ***a, int rows, int cols, int ch) {
    for (int r = 0; r < rows; r++)
        for (int c = 0; c < cols; c++)
            for (int p = 0; p < ch; p++) {
                int v = (int)a[r][c][p];
                fwrite(&v, sizeof v, 1, f);
            }
}

static void zero3(long ***a, int rows, int cols, int ch) {
    for (int r = 0; r < rows; r++)
        for (int c = 0; c < cols; c++)
            memset(a[r][c], 0, ch * sizeof(long));
}

int main(int argc, char **argv) {
    if (argc != 5) {
        fprintf(stderr, "usage: %s in.raw conv.raw gray.raw minmax.raw\n",
                argv[0]);
        return 2;
    }
    static unsigned char buf[DIM_ROW * DIM_COL * DIM_RGB];
    FILE *f = fopen(argv[1], "rb");
    if (!f || fread(buf, 1, sizeof buf, f) != sizeof buf) {
        fprintf(stderr, "bad input\n");
        return 1;
    }
    fclose(f);

    /* padded image for the convolution: one zero ring (PAD/2 per side) */
    static long padded[DIM_ROW + PAD][DIM_COL + PAD][DIM_RGB];
    static long plain[DIM_ROW][DIM_COL][DIM_RGB];
    for (int r = 0; r < DIM_ROW; r++)
        for (int c = 0; c < DIM_COL; c++)
            for (int p = 0; p < DIM_RGB; p++) {
                long v = buf[(r * DIM_COL + c) * DIM_RGB + p];
                padded[r + PAD / 2][c + PAD / 2][p] = v;
                plain[r][c][p] = v;
            }

    long gblur[DIM_KERNEL][DIM_KERNEL] =
        {{1, 2, 1}, {2, 4, 2}, {1, 2, 1}};
    long asym[DIM_KERNEL][DIM_KERNEL] =
        {{1, 2, 3}, {4, 5, 6}, {7, 8, 9}};

    long ***conv = alloc3(DIM_ROW, DIM_COL, DIM_RGB);
    FILE *fc = fopen(argv[2], "wb");
    parallel_convolution(padded, gblur, conv);
    write3(fc, conv, DIM_ROW, DIM_COL, DIM_RGB);
    zero3(conv, DIM_ROW, DIM_COL, DIM_RGB);  /* kernel does += */
    parallel_convolution(padded, asym, conv);
    write3(fc, conv, DIM_ROW, DIM_COL, DIM_RGB);
    fclose(fc);

    long ***gray = alloc3(DIM_ROW, DIM_COL, DIM_RGB);
    long minmax[2];
    parallel_to_grayscale(plain, gray, minmax);
    FILE *fg = fopen(argv[3], "wb");
    write3(fg, gray, DIM_ROW, DIM_COL, DIM_RGB);
    fclose(fg);
    FILE *fm = fopen(argv[4], "wb");
    int mm[2] = {(int)minmax[0], (int)minmax[1]};
    fwrite(mm, sizeof mm[0], 2, fm);
    fclose(fm);
    return 0;
}

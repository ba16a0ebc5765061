/* The header old/parallel_convolution.c:5 and old/parallel_to_grayscale.c:5
 * include but the reference never committed (SURVEY C17). Supplies the
 * compile-time constants those kernels need, with values implied by the
 * code itself:
 *   - DIM_KERNEL = 3 (the "3x3 convolution" of old/Performance.md:17),
 *     so PAD = DIM_KERNEL - 1 = 2 (one zero ring: output [r][c] reads
 *     padded rows r..r+2 -> center r+1, i.e. zero-padded same-size conv);
 *   - GBLUR_NORM = 16 (the 1-2-1 Gaussian's weight sum);
 *   - DIM_ROW/DIM_COL sized to the committed golden crop (the kernels
 *     take dimensions as compile-time array bounds).
 */
#ifndef UTILS_H
#define UTILS_H

#define DIM_ROW 96
#define DIM_COL 128
#define DIM_RGB 3
#define DIM_KERNEL 3
#define PAD (DIM_KERNEL - 1)
#define GBLUR_NORM 16

#endif

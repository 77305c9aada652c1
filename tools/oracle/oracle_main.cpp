// Headless oracle harness around the reference renderer.
//
// This file is OURS (rtf_tpu test tooling). It #includes a *patched
// copy* of the reference's main.cpp (prepared by tools/oracle/build.py
// in a scratch dir: viewport.cpp include removed, `main` renamed,
// #defines made overridable) and drives the reference's own
// LoadScene/BeginRender pipeline without GLUT, so we can regenerate
// converged / deterministic golden images and photon .dat dumps on
// this machine (VERDICT.md round-1 item #2).
//
// Usage: oracle <scene.xml> <out.png> [<out_z.png> [<out_sc.png>]]
// Run with cwd = the (copied) project dir so relative asset paths and
// .dat dumps resolve there.

// Pre-include every std header the reference main.cpp uses, BEFORE its
// scene.h defines min/max macros that would break <algorithm>.
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <iostream>
#include <thread>
#include <vector>

#include ORACLE_MAIN_CPP  // set by build.py: the patched main.cpp

// viewport.cpp (removed by the patch) defined ShowViewport plus the GL
// rasterization virtuals; the oracle never rasterizes.  The per-class
// no-op bodies are auto-generated per project era by build.py into
// viewport_stubs.cpp (the stub set differs between eras).
void ShowViewport() {}

// The sample-count AOV only exists from Proj8 on; SFINAE-dispatch so
// earlier-era RenderImage classes (e.g. Proj7) still compile.
template <class T>
auto SaveSampleCount(T &img, const char *path, int)
    -> decltype(img.ComputeSampleCountImage(), void()) {
  img.ComputeSampleCountImage();
  img.SaveSampleCountImage(path);
}
template <class T>
void SaveSampleCount(T &, const char *, long) {
  std::fprintf(stderr, "[oracle] no sample-count AOV in this era\n");
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s scene.xml out.png [z.png [sc.png]]\n",
                 argv[0]);
    return 2;
  }
  pIt.Init();
  LoadScene(argv[1]);
  auto t0 = std::chrono::steady_clock::now();
  BeginRender();  // joins (Proj<=8 era) or detaches (Final era)
  // Poll for completion, with a stall guard: if the atomic pixel
  // counter stops advancing for 120 s, the detached workers are done
  // but some pixels never incremented it (e.g. debug skips in the
  // committed loops) — save what we have instead of hanging forever.
  int last = -1, stall_ms = 0;
  while (!renderImage.IsRenderDone()) {
    std::this_thread::sleep_for(std::chrono::milliseconds(50));
    int now = renderImage.GetNumRenderedPixels();
    stall_ms = (now == last) ? stall_ms + 50 : 0;
    last = now;
    if (stall_ms >= 120000) {
      std::fprintf(stderr,
                   "[oracle] WARNING: render stalled at %d/%d pixels; "
                   "saving partial frame\n", last,
                   renderImage.GetWidth() * renderImage.GetHeight());
      break;
    }
  }
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                          t0).count();
  std::fprintf(stderr, "[oracle] render done in %.2fs (%dx%d)\n", dt,
               renderImage.GetWidth(), renderImage.GetHeight());
  renderImage.SaveImage(argv[2]);
  if (argc > 3) {
    renderImage.ComputeZBufferImage();
    renderImage.SaveZImage(argv[3]);
  }
  if (argc > 4) {
    SaveSampleCount(renderImage, argv[4], 0);
  }
  return 0;
}

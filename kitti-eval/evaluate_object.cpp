// KITTI pedestrian 3D-localization benchmark evaluator.
//
// A from-scratch C++ implementation with the same evaluation semantics as the
// reference's modified KITTI devkit (/root/reference/kitti-eval/
// evaluate_object.cpp, itself derived from the public KITTI devkit /
// cguindel/eval_kitti):
//   * pedestrian-only, with Person_sitting as the ignored neighboring class
//   * difficulties EASY/MODERATE/HARD plus an aggregate ALL bin
//   * 41-point interpolated AP over score-discretized recall levels
//   * min IoU 0.3 (image) / 0.5 (ground) / 0.5 (3D)
//   * RALP: relative-error AP — a detection only counts if its 3D location
//     error is below {1%, 5%, 10%} of the gt distance + 0.20 m margin
//   * AOS orientation similarity + MPPE (8 viewpoint bins, 22.5 deg offset)
//   * optional recall-vs-IoU sweep (51 points) and recall-vs-distance sweep
//     (10..60 m step 5)
//
// Differences from the reference build: no boost (bird-view polygon overlap is
// an in-house Sutherland-Hodgman convex clip) and no libpng/gnuplot (stats are
// written as plain txt consumed by parser.py).
//
// Usage: ./evaluate_object result_sha val_dataset [analyze_recall] [analyze_distance]
//   reads  lists/<val_dataset>.txt     (image indices)
//          data/object/label_2/*.txt   (ground truth)
//          results/<result_sha>/data/*.txt (detections)
//   writes results/<result_sha>/stats_pedestrian_<param>.txt

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <numeric>
#include <string>
#include <sys/stat.h>
#include <vector>

using std::max;
using std::min;
using std::string;
using std::vector;

// ---------------------------------------------------------------------------
// Parameters
// ---------------------------------------------------------------------------

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2, ALL = 3 };
enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

static const int MIN_HEIGHT[4] = {40, 25, 25, 0};
static const int MAX_OCCLUSION[4] = {0, 1, 2, 2};
static const double MAX_TRUNCATION[4] = {0.15, 0.3, 0.5, 1.0};

static const char *CLASS_NAME = "pedestrian";
static const double MIN_OVERLAP[3] = {0.3, 0.5, 0.5};

static const int N_RELATIVE_ERROR = 3;
static const double RELATIVE_ERRORS[N_RELATIVE_ERROR] = {0.01, 0.05, 0.10};
static const char *RELATIVE_TAGS[N_RELATIVE_ERROR] = {"1%", "5%", "10%"};

static const int N_SAMPLE_PTS = 41;
static const int N_IOU_SAMPLE_PTS = 51;

static const int VIEWP_BINS = 8;
static const double VIEWP_OFFSET = 0.3927;

static const int MIN_DIST = 10, DELTA_DIST = 5, MAX_DIST = 60;
static const double MIN_SCORE = -1000.0;

// ---------------------------------------------------------------------------
// Data types
// ---------------------------------------------------------------------------

struct Box {
  string type;
  double x1, y1, x2, y2;
  double alpha;
};

struct GroundTruth {
  Box box;
  double truncation;
  int occlusion;
  double ry;
  double t1, t2, t3;
  double h, w, l;
};

struct Detection {
  Box box;
  double score;
  double ry;
  double t1, t2, t3;
  double h, w, l;
};

struct PrData {
  vector<double> scores;   // TP candidate scores (threshold selection pass)
  double similarity = 0;   // summed orientation similarity
  int tp = 0, fp = 0, fn = 0;
  vector<int> pred_bins = vector<int>(VIEWP_BINS, 0);
  vector<int> tp_bins = vector<int>(VIEWP_BINS, 0);
};

// ---------------------------------------------------------------------------
// Loading
// ---------------------------------------------------------------------------

static vector<GroundTruth> load_groundtruth(const string &path, bool &ok) {
  vector<GroundTruth> gts;
  FILE *fp = fopen(path.c_str(), "r");
  if (!fp) { ok = false; return gts; }
  char type[255];
  while (!feof(fp)) {
    GroundTruth g;
    if (fscanf(fp, "%254s %lf %d %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
               type, &g.truncation, &g.occlusion, &g.box.alpha,
               &g.box.x1, &g.box.y1, &g.box.x2, &g.box.y2,
               &g.h, &g.w, &g.l, &g.t1, &g.t2, &g.t3, &g.ry) == 15) {
      g.box.type = type;
      gts.push_back(g);
    } else {
      break;
    }
  }
  fclose(fp);
  ok = true;
  return gts;
}

static vector<Detection> load_detections(const string &path, bool &compute_aos,
                                         bool &ok) {
  vector<Detection> dets;
  FILE *fp = fopen(path.c_str(), "r");
  if (!fp) { ok = false; return dets; }
  char type[255];
  double trash;
  while (!feof(fp)) {
    Detection d;
    if (fscanf(fp, "%254s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
               type, &trash, &trash, &d.box.alpha,
               &d.box.x1, &d.box.y1, &d.box.x2, &d.box.y2,
               &d.h, &d.w, &d.l, &d.t1, &d.t2, &d.t3, &d.ry, &d.score) == 16) {
      if (d.score < MIN_SCORE) continue;
      d.box.type = type;
      dets.push_back(d);
      if (d.box.alpha == -10) compute_aos = false;
    } else {
      break;
    }
  }
  fclose(fp);
  ok = true;
  return dets;
}

// ---------------------------------------------------------------------------
// Overlap functions
// ---------------------------------------------------------------------------

// criterion: -1 union, 0 area of a (detection), 1 area of b
static double image_box_overlap(const Box &a, const Box &b, int criterion) {
  double x1 = max(a.x1, b.x1), y1 = max(a.y1, b.y1);
  double x2 = min(a.x2, b.x2), y2 = min(a.y2, b.y2);
  double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0;
  double inter = w * h;
  double a_area = (a.x2 - a.x1) * (a.y2 - a.y1);
  double b_area = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / a_area;
  if (criterion == 1) return inter / b_area;
  return inter / (a_area + b_area - inter);
}

static double image_overlap(const Detection &d, const GroundTruth &g,
                            int criterion, double) {
  return image_box_overlap(d.box, g.box, criterion);
}

// RALP: the 2D overlap counts only if the 3D localization error is within
// relative_error * ||gt|| + 0.20 m.
static double image_overlap_relative(const Detection &d, const GroundTruth &g,
                                     int criterion, double relative_error) {
  double o = image_box_overlap(d.box, g.box, criterion);
  double dist = std::sqrt((g.t1 - d.t1) * (g.t1 - d.t1) +
                          (g.t2 - d.t2) * (g.t2 - d.t2) +
                          (g.t3 - d.t3) * (g.t3 - d.t3));
  double thr = relative_error * std::sqrt(g.t1 * g.t1 + g.t2 * g.t2 + g.t3 * g.t3)
               + 0.20;
  return dist <= thr ? o : 0.0;
}

struct Pt { double x, y; };

// Yaw-rotated bird-view rectangle corners (x-z plane).
template <typename T>
static vector<Pt> bird_rect(const T &o) {
  double c = std::cos(o.ry), s = std::sin(o.ry);
  double xs[4] = {o.l / 2, o.l / 2, -o.l / 2, -o.l / 2};
  double zs[4] = {o.w / 2, -o.w / 2, -o.w / 2, o.w / 2};
  vector<Pt> out(4);
  for (int i = 0; i < 4; ++i) {
    out[i].x = c * xs[i] + s * zs[i] + o.t1;
    out[i].y = -s * xs[i] + c * zs[i] + o.t3;
  }
  return out;
}

static double polygon_area(const vector<Pt> &p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    size_t j = (i + 1) % p.size();
    a += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return std::fabs(a) / 2.0;
}

// Sutherland-Hodgman clip of convex polygon `subject` against convex `clip`.
static vector<Pt> convex_clip(vector<Pt> subject, const vector<Pt> &clip) {
  // Ensure counter-clockwise clip polygon.
  auto cross = [](const Pt &o, const Pt &a, const Pt &b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
  };
  vector<Pt> clipper = clip;
  double signed_area = 0;
  for (size_t i = 0; i < clipper.size(); ++i) {
    size_t j = (i + 1) % clipper.size();
    signed_area += clipper[i].x * clipper[j].y - clipper[j].x * clipper[i].y;
  }
  if (signed_area < 0) std::reverse(clipper.begin(), clipper.end());

  for (size_t i = 0; i < clipper.size() && !subject.empty(); ++i) {
    const Pt &A = clipper[i];
    const Pt &B = clipper[(i + 1) % clipper.size()];
    vector<Pt> out;
    for (size_t j = 0; j < subject.size(); ++j) {
      const Pt &P = subject[j];
      const Pt &Q = subject[(j + 1) % subject.size()];
      bool p_in = cross(A, B, P) >= 0;
      bool q_in = cross(A, B, Q) >= 0;
      if (p_in) out.push_back(P);
      if (p_in != q_in) {
        double a1 = (B.x - A.x), b1 = (B.y - A.y);
        double a2 = (Q.x - P.x), b2 = (Q.y - P.y);
        double denom = a1 * b2 - a2 * b1;
        if (std::fabs(denom) > 1e-12) {
          // Parameter along AB of the PQ/AB intersection point.
          double s = ((P.x - A.x) * b2 - (P.y - A.y) * a2) / denom;
          Pt X{A.x + s * a1, A.y + s * b1};
          out.push_back(X);
        }
      }
    }
    subject = out;
  }
  return subject;
}

static double bird_intersection_area(const vector<Pt> &a, const vector<Pt> &b) {
  vector<Pt> inter = convex_clip(a, b);
  if (inter.size() < 3) return 0.0;
  return polygon_area(inter);
}

static double ground_overlap(const Detection &d, const GroundTruth &g,
                             int criterion, double) {
  vector<Pt> dp = bird_rect(d), gp = bird_rect(g);
  double inter = bird_intersection_area(dp, gp);
  double d_area = polygon_area(dp), g_area = polygon_area(gp);
  if (criterion == 0) return inter / d_area;
  if (criterion == 1) return inter / g_area;
  return inter / (d_area + g_area - inter);
}

static double box3d_overlap(const Detection &d, const GroundTruth &g,
                            int criterion, double) {
  vector<Pt> dp = bird_rect(d), gp = bird_rect(g);
  double inter_area = bird_intersection_area(dp, gp);
  double ymax = min(d.t2, g.t2);
  double ymin = max(d.t2 - d.h, g.t2 - g.h);
  double inter_vol = inter_area * max(0.0, ymax - ymin);
  double det_vol = d.h * d.l * d.w;
  double gt_vol = g.h * g.l * g.w;
  if (criterion == 0) return inter_vol / det_vol;
  if (criterion == 1) return inter_vol / gt_vol;
  return inter_vol / (det_vol + gt_vol - inter_vol);
}

typedef double (*OverlapFn)(const Detection &, const GroundTruth &, int, double);

// ---------------------------------------------------------------------------
// Evaluation core
// ---------------------------------------------------------------------------

static bool iequals(const string &a, const char *b) {
  return strcasecmp(a.c_str(), b) == 0;
}

// Classify each gt/detection as evaluated (0), ignored (1) or other-class (-1).
static void clean_data(const vector<GroundTruth> &gt, const vector<Detection> &det,
                       vector<int> &ignored_gt, vector<GroundTruth> &dontcare,
                       vector<int> &ignored_det, int &n_gt, Difficulty difficulty) {
  for (const auto &g : gt) {
    double height = g.box.y2 - g.box.y1;
    int valid_class;
    if (iequals(g.box.type, CLASS_NAME)) valid_class = 1;
    else if (iequals(g.box.type, "Person_sitting")) valid_class = 0;
    else valid_class = -1;

    // Difficulty category of this gt (easy 0 / moderate 1 / hard 2 / none -1).
    int cat = -1;
    if (g.occlusion <= MAX_OCCLUSION[0] && g.truncation <= MAX_TRUNCATION[0] &&
        height > MIN_HEIGHT[0]) cat = 0;
    else if (g.occlusion <= MAX_OCCLUSION[1] && g.truncation <= MAX_TRUNCATION[1] &&
             height > MIN_HEIGHT[1]) cat = 1;
    else if (g.occlusion <= MAX_OCCLUSION[2] && g.truncation <= MAX_TRUNCATION[2] &&
             height > MIN_HEIGHT[2]) cat = 2;

    bool ignore = (difficulty != ALL) && (difficulty != cat);
    if (difficulty == ALL && cat == -1) ignore = false;  // ALL keeps everything valid-class

    if (valid_class == 1 && !ignore) { ignored_gt.push_back(0); n_gt++; }
    else if (valid_class == 0 || (ignore && valid_class == 1)) ignored_gt.push_back(1);
    else ignored_gt.push_back(-1);
  }
  for (const auto &g : gt)
    if (iequals(g.box.type, "DontCare")) dontcare.push_back(g);

  for (const auto &d : det) {
    int valid_class = iequals(d.box.type, CLASS_NAME) ? 1 : -1;
    double height = std::fabs(d.box.y1 - d.box.y2);
    if (height < MIN_HEIGHT[difficulty]) ignored_det.push_back(1);
    else if (valid_class == 1) ignored_det.push_back(0);
    else ignored_det.push_back(-1);
  }
}

static PrData compute_statistics(const vector<GroundTruth> &gt,
                                 const vector<Detection> &det,
                                 const vector<GroundTruth> &dc,
                                 const vector<int> &ignored_gt,
                                 const vector<int> &ignored_det,
                                 bool compute_fp, OverlapFn overlap_fn,
                                 Metric metric, bool compute_aos,
                                 double thresh, double fixed_iou,
                                 double relative_error) {
  PrData stat;
  const double NO_DETECTION = -1e7;
  vector<double> delta;
  vector<int> pred_bin(VIEWP_BINS, 0), tp_bin(VIEWP_BINS, 0);
  vector<bool> assigned(det.size(), false);
  vector<bool> ignored_threshold(det.size(), false);
  double min_overlap = fixed_iou > 0 ? fixed_iou : MIN_OVERLAP[metric];

  if (compute_fp)
    for (size_t i = 0; i < det.size(); ++i)
      if (det[i].score < thresh) ignored_threshold[i] = true;

  for (size_t i = 0; i < gt.size(); ++i) {
    if (ignored_gt[i] == -1) continue;

    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_ov = 0;
    bool assigned_ignored_det = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j]) continue;
      double ov = overlap_fn(det[j], gt[i], -1, relative_error);
      if (!compute_fp && ov > min_overlap && det[j].score > valid_detection) {
        det_idx = (int)j;
        valid_detection = det[j].score;
      } else if (compute_fp && ov > min_overlap &&
                 (ov > max_ov || assigned_ignored_det) && ignored_det[j] == 0) {
        max_ov = ov;
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && ov > min_overlap && valid_detection == NO_DETECTION &&
                 ignored_det[j] == 1) {
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }

    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      stat.fn++;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      stat.tp++;
      stat.scores.push_back(det[det_idx].score);
      if (compute_aos) {
        delta.push_back(gt[i].box.alpha - det[det_idx].box.alpha);
        double g_ang = gt[i].box.alpha;
        if (g_ang < 0) g_ang += 2 * M_PI;
        int g_bin = (int)std::floor((g_ang + VIEWP_OFFSET) / (2 * M_PI / VIEWP_BINS));
        double d_ang = det[det_idx].box.alpha;
        if (d_ang < 0) d_ang += 2 * M_PI;
        int d_bin = (int)std::floor((d_ang + VIEWP_OFFSET) / (2 * M_PI / VIEWP_BINS));
        if (g_bin >= VIEWP_BINS) g_bin = 0;
        if (d_bin >= VIEWP_BINS) d_bin = 0;
        pred_bin[d_bin]++;
        if (g_bin == d_bin) tp_bin[d_bin]++;
      }
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t i = 0; i < det.size(); ++i)
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1 ||
            ignored_threshold[i]))
        stat.fp++;

    // Subtract detections falling on DontCare areas.
    int nstuff = 0;
    for (const auto &d : dc) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]) continue;
        double ov = overlap_fn(det[j], d, 0, relative_error);
        if (ov > min_overlap) { assigned[j] = true; nstuff++; }
      }
    }
    stat.fp -= nstuff;

    if (compute_aos) {
      vector<double> tmp(stat.fp, 0.0);
      for (double de : delta) tmp.push_back((1.0 + std::cos(de)) / 2.0);
      if (stat.tp > 0 || stat.fp > 0) {
        stat.similarity = std::accumulate(tmp.begin(), tmp.end(), 0.0);
        stat.tp_bins = tp_bin;
        stat.pred_bins = pred_bin;
      } else {
        stat.similarity = -1;
        stat.tp_bins.assign(VIEWP_BINS, -1);
        stat.pred_bins.assign(VIEWP_BINS, -1);
      }
    }
  }
  return stat;
}

// Score thresholds producing N_SAMPLE_PTS equally spaced recall levels.
static vector<double> get_thresholds(vector<double> v, double n_gt) {
  vector<double> t;
  std::sort(v.begin(), v.end(), std::greater<double>());
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    double l_recall = (double)(i + 1) / n_gt;
    double r_recall = i < v.size() - 1 ? (double)(i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

struct EvalResult {
  vector<double> precision;       // 41 points
  vector<double> aos;             // 41 points (may be empty)
  vector<double> mppe;            // 41 points (may be empty)
  vector<double> recalls_vs_iou;  // 51 points (optional)
  bool ok = false;
};

static EvalResult eval_class(const vector<vector<GroundTruth>> &groundtruth,
                             const vector<vector<Detection>> &detections,
                             bool compute_aos, OverlapFn overlap_fn,
                             Difficulty difficulty, Metric metric,
                             bool analyze_recall, double relative_error) {
  EvalResult res;
  int n_gt = 0;
  vector<double> scores;
  vector<vector<int>> ignored_gt, ignored_det;
  vector<vector<GroundTruth>> dontcare;

  for (size_t i = 0; i < groundtruth.size(); ++i) {
    vector<int> i_gt, i_det;
    vector<GroundTruth> dc;
    clean_data(groundtruth[i], detections[i], i_gt, dc, i_det, n_gt, difficulty);
    ignored_gt.push_back(i_gt);
    ignored_det.push_back(i_det);
    dontcare.push_back(dc);
    PrData pr = compute_statistics(groundtruth[i], detections[i], dc, i_gt, i_det,
                                   false, overlap_fn, metric, false, 0.0, -1.0,
                                   relative_error);
    scores.insert(scores.end(), pr.scores.begin(), pr.scores.end());
  }
  if (n_gt <= 0) {
    std::cout << "No GT samples found" << std::endl;
    return res;
  }

  vector<double> thresholds = get_thresholds(scores, n_gt);
  vector<PrData> pr(thresholds.size());
  vector<PrData> all(analyze_recall ? N_IOU_SAMPLE_PTS : 0);

  for (size_t i = 0; i < groundtruth.size(); ++i) {
    if (analyze_recall && !thresholds.empty()) {
      for (int j = 0; j < N_IOU_SAMPLE_PTS; ++j) {
        double iou = (1.0 / (N_IOU_SAMPLE_PTS - 1)) * j;
        PrData tmp = compute_statistics(
            groundtruth[i], detections[i], dontcare[i], ignored_gt[i],
            ignored_det[i], true, overlap_fn, metric, compute_aos,
            thresholds.back(), iou, relative_error);
        all[j].tp += tmp.tp;
        all[j].fn += tmp.fn;
      }
    }
    for (size_t t = 0; t < thresholds.size(); ++t) {
      PrData tmp = compute_statistics(
          groundtruth[i], detections[i], dontcare[i], ignored_gt[i],
          ignored_det[i], true, overlap_fn, metric, compute_aos, thresholds[t],
          -1.0, relative_error);
      pr[t].tp += tmp.tp;
      pr[t].fp += tmp.fp;
      pr[t].fn += tmp.fn;
      if (tmp.similarity != -1) {
        pr[t].similarity += tmp.similarity;
        for (int vp = 0; vp < VIEWP_BINS; ++vp) {
          if (tmp.tp_bins[vp] != -1 && tmp.pred_bins[vp] != -1) {
            pr[t].tp_bins[vp] += tmp.tp_bins[vp];
            pr[t].pred_bins[vp] += tmp.pred_bins[vp];
          }
        }
      }
    }
  }

  if (analyze_recall)
    for (int j = 0; j < N_IOU_SAMPLE_PTS; ++j)
      res.recalls_vs_iou.push_back(all[j].tp / (double)(all[j].tp + all[j].fn));

  res.precision.assign(N_SAMPLE_PTS, 0.0);
  if (compute_aos) {
    res.aos.assign(N_SAMPLE_PTS, 0.0);
    res.mppe.assign(N_SAMPLE_PTS, 0.0);
  }
  for (size_t i = 0; i < thresholds.size(); ++i) {
    res.precision[i] = pr[i].tp / (double)(pr[i].tp + pr[i].fp);
    if (compute_aos) {
      res.aos[i] = pr[i].similarity / (double)(pr[i].tp + pr[i].fp);
      int nz = 0;
      for (int vp = 0; vp < VIEWP_BINS; ++vp) {
        if (pr[i].pred_bins[vp] > 0) {
          nz++;
          res.mppe[i] += pr[i].tp_bins[vp] / (double)pr[i].pred_bins[vp];
        }
      }
      res.mppe[i] = nz ? res.mppe[i] / nz : 0.0;
    }
  }
  // Right-max interpolation of the precision curve.
  for (size_t i = 0; i < thresholds.size(); ++i) {
    res.precision[i] = *std::max_element(res.precision.begin() + i,
                                         res.precision.end());
    if (compute_aos) {
      res.aos[i] = *std::max_element(res.aos.begin() + i, res.aos.end());
      res.mppe[i] = *std::max_element(res.mppe.begin() + i, res.mppe.end());
    }
  }
  res.ok = true;
  return res;
}

// ---------------------------------------------------------------------------
// Output
// ---------------------------------------------------------------------------

static void write_rows(const string &path, const vector<vector<double>> &rows) {
  FILE *fp = fopen(path.c_str(), "w");
  if (!fp) { std::cout << "Cannot write " << path << std::endl; return; }
  for (const auto &row : rows) {
    for (double v : row) fprintf(fp, "%f ", v);
    fprintf(fp, "\n");
  }
  fclose(fp);
  std::cout << "Wrote " << path << std::endl;
}

static double average_ap(const vector<double> &precision) {
  double s = 0;
  for (int i = 1; i < N_SAMPLE_PTS; ++i) s += precision[i];
  return s / (N_SAMPLE_PTS - 1);
}

// ---------------------------------------------------------------------------
// Driver
// ---------------------------------------------------------------------------

int main(int argc, char *argv[]) {
  if (argc < 3 || argc > 5) {
    std::cout << "Usage: ./evaluate_object result_sha val_dataset "
                 "[analyze_recall (default 0)] [analyze_distance (default 0)]"
              << std::endl;
    return 1;
  }
  string result_sha = argv[1];
  string input_dataset = argv[2];
  bool analyze_recall = argc >= 4 && atoi(argv[3]) != 0;
  bool analyze_distance = argc >= 5 && atoi(argv[4]) != 0;

  string gt_dir = "data/object/label_2";
  string result_dir = "results/" + result_sha;
  string lists_path = "lists/" + input_dataset + ".txt";

  std::ifstream lists(lists_path.c_str());
  if (!lists.is_open()) {
    std::cout << lists_path << " not found" << std::endl;
    return 1;
  }
  vector<int> indices;
  string line;
  while (std::getline(lists, line))
    if (atoi(line.c_str()) != 0 || line == "000000") indices.push_back(atoi(line.c_str()));
  std::cout << "Evaluating " << indices.size() << " images" << std::endl;

  vector<vector<GroundTruth>> groundtruth;
  vector<vector<Detection>> detections;
  bool compute_aos = true;
  for (int idx : indices) {
    char name[64];
    snprintf(name, sizeof(name), "%06d.txt", idx);
    bool gt_ok, det_ok;
    groundtruth.push_back(load_groundtruth(gt_dir + "/" + name, gt_ok));
    detections.push_back(load_detections(result_dir + "/data/" + name,
                                         compute_aos, det_ok));
    if (!gt_ok) {
      std::cout << "ERROR: Couldn't read gt " << name << std::endl;
      return 1;
    }
    if (!det_ok) {
      std::cout << "ERROR: Couldn't read detections " << name << std::endl;
      return 1;
    }
  }

  struct Task {
    string param;
    OverlapFn fn;
    Metric metric;
    double rel_err;
  };
  vector<Task> tasks = {
      {"detection", image_overlap, IMAGE, 0.0},
      {"detection_1%", image_overlap_relative, IMAGE, RELATIVE_ERRORS[0]},
      {"detection_5%", image_overlap_relative, IMAGE, RELATIVE_ERRORS[1]},
      {"detection_10%", image_overlap_relative, IMAGE, RELATIVE_ERRORS[2]},
      {"detection_ground", ground_overlap, GROUND, 0.0},
      {"detection_3d", box3d_overlap, BOX3D, 0.0},
  };
  (void)RELATIVE_TAGS;

  for (const auto &task : tasks) {
    std::cout << "==== " << task.param << " ====" << std::endl;
    vector<vector<double>> prec_rows, aos_rows, mppe_rows, iou_rows;
    bool aos_available = compute_aos && task.metric == IMAGE;
    for (int d = 0; d < 4; ++d) {
      EvalResult r = eval_class(groundtruth, detections, aos_available, task.fn,
                                (Difficulty)d, task.metric, analyze_recall,
                                task.rel_err);
      // Keep a fixed 4-row layout (easy/moderate/hard/all) even when a
      // difficulty bin has no ground truth.
      vector<double> zeros(N_SAMPLE_PTS, 0.0);
      prec_rows.push_back(r.ok ? r.precision : zeros);
      if (aos_available && r.ok && !r.aos.empty()) {
        aos_rows.push_back(r.aos);
        mppe_rows.push_back(r.mppe);
      }
      if (analyze_recall && r.ok && !r.recalls_vs_iou.empty())
        iou_rows.push_back(r.recalls_vs_iou);
      const char *diffs[4] = {"easy", "moderate", "hard", "all"};
      if (r.ok)
        printf("  AP(%s) = %.2f\n", diffs[d], 100.0 * average_ap(r.precision));
    }
    // File-set and row-layout contract of the reference devkit: per task a
    // precision file plus (image-metric tasks) orientation/MPPE companions,
    // and an iour recall-vs-IoU file for every task — each suffixed with the
    // task variant ("", "_1%", "_ground", ...); rows appear only for
    // difficulty bins that evaluated (reference evaluate_object.cpp:236-268,
    // 1224-1228, 1293-1297, 1361-1362, 1389-1390).
    string suffix = task.param.substr(string("detection").size());
    write_rows(result_dir + "/stats_" + CLASS_NAME + "_" + task.param + ".txt",
               prec_rows);
    if (aos_available) {
      write_rows(result_dir + "/stats_" + CLASS_NAME + "_orientation" + suffix +
                     ".txt", aos_rows);
      write_rows(result_dir + "/stats_" + CLASS_NAME + "_mppe" + suffix + ".txt",
                 mppe_rows);
    }
    write_rows(result_dir + "/stats_" + CLASS_NAME + "_iour" + suffix + ".txt",
               iou_rows);
  }

  // Recall vs distance sweep (MODERATE difficulty, plain detection metric):
  // fraction of gt within each max distance that is recalled.
  if (analyze_distance) {
    vector<vector<double>> dist_rows;
    for (int d = 0; d < 4; ++d) {
      vector<double> row;
      for (int dist = MIN_DIST; dist <= MAX_DIST; dist += DELTA_DIST) {
        int tp = 0, fn = 0;
        for (size_t i = 0; i < groundtruth.size(); ++i) {
          // Filter gt by distance.
          vector<GroundTruth> gt_f;
          for (const auto &g : groundtruth[i]) {
            double gd = std::sqrt(g.t1 * g.t1 + g.t3 * g.t3);
            if (gd <= dist || !iequals(g.box.type, CLASS_NAME)) gt_f.push_back(g);
          }
          vector<int> i_gt, i_det;
          vector<GroundTruth> dc;
          int n_gt_local = 0;
          clean_data(gt_f, detections[i], i_gt, dc, i_det, n_gt_local,
                     (Difficulty)d);
          PrData pr = compute_statistics(gt_f, detections[i], dc, i_gt, i_det,
                                         true, image_overlap, IMAGE, false,
                                         MIN_SCORE, -1.0, 0.0);
          tp += pr.tp;
          fn += pr.fn;
        }
        row.push_back(tp + fn > 0 ? tp / (double)(tp + fn) : 0.0);
      }
      dist_rows.push_back(row);
    }
    write_rows(result_dir + "/stats_" + CLASS_NAME + "_distance.txt", dist_rows);
  }

  std::cout << "Evaluation finished successfully" << std::endl;
  return 0;
}

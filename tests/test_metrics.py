"""Metric tests vs closed-form values (parity with ref metrics/)."""
import numpy as np

from dct_tpu.metrics import (
    AggregatedMeter,
    AverageValueMeter,
    ConfusionMatrix,
    DiceMeter,
    IoU,
    Kappa2Annotator,
    KappaMetrics,
    ListAggregatedMeter,
    cohen_kappa,
)


class TestAverageValueMeter:
    def test_mean_std(self):
        m = AverageValueMeter()
        for v in [1.0, 2.0, 3.0, 4.0]:
            m.add(v)
        mean, std = m.value()
        assert np.isclose(mean, 2.5)
        assert np.isclose(std, np.std([1, 2, 3, 4]))

    def test_empty(self):
        m = AverageValueMeter()
        assert np.isnan(m.value()[0])


class TestDiceMeter:
    def test_2d_accumulation(self):
        m = DiceMeter("2d", report_axises=[1, 2], C=3)
        m.add(np.array([[1.0, 0.5, 0.5], [1.0, 1.0, 0.0]]))
        (mean, std), (cls_means, _) = m.value()
        assert np.isclose(cls_means[1], 0.75)
        assert np.isclose(mean, np.mean([(0.5 + 0.5) / 2, (1.0 + 0.0) / 2]))

    def test_3d_rows(self):
        m = DiceMeter("3d", report_axises="all", C=2)
        m.add(np.array([0.8, 0.6]))
        m.add(np.array([0.4, 0.2]))
        (mean, _), (cls_means, _) = m.value()
        assert np.isclose(cls_means[0], 0.6)
        assert np.isclose(mean, 0.5)

    def test_empty_returns_zeros(self):
        m = DiceMeter("2d", C=4)
        (mean, _), (cls, _) = m.value()
        assert mean == 0.0 and len(cls) == 4

    def test_summary_variants(self):
        m = DiceMeter("2d", report_axises=[1], C=2)
        m.add(np.array([[0.5, 1.0]]))
        assert set(m.summary()) == {"mDSC", "mVars"}
        assert set(m.summary(detailed=True)) == {"mDSC", "DSC1"}


class TestConfusionIoU:
    def test_perfect(self):
        iou = IoU(num_classes=3)
        pred = np.array([[[0, 1], [2, 1]]])
        iou.add(pred, pred)
        v = iou.value()
        assert np.isclose(v["Mean_IoU"], 1.0)
        assert np.isclose(v["Overall_Acc"], 1.0)

    def test_known_matrix(self):
        cm = ConfusionMatrix(2)
        cm.add(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]))
        expect = np.array([[1, 0], [1, 2]])
        assert np.array_equal(cm.value(), expect)

    def test_iou_values(self):
        iou = IoU(num_classes=2)
        iou.add(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]))
        v = iou.value()
        # class0: tp=1, fp+fn=1 → 1/2 ; class1: tp=2, fp=0, fn=1 → 2/3
        assert np.isclose(v["Class_IoU"][0], 0.5)
        assert np.isclose(v["Class_IoU"][1], 2 / 3)

    def test_ignore_index(self):
        cm = ConfusionMatrix(2, ignore_index=255)
        cm.add(np.array([0, 1]), np.array([0, 255]))
        assert cm.value().sum() == 1


class TestKappa:
    def test_perfect_agreement(self):
        a = np.array([0, 1, 2, 0, 1, 2])
        assert np.isclose(cohen_kappa(a, a), 1.0)

    def test_matches_sklearn_formula(self):
        rs = np.random.RandomState(0)
        y1 = rs.randint(0, 3, 500)
        y2 = rs.randint(0, 3, 500)
        k = cohen_kappa(y1, y2)
        # independent random labels → kappa ≈ 0
        assert abs(k) < 0.1

    def test_kappa_metrics_masking(self):
        m = KappaMetrics()
        target = np.array([[0, 1, 2, 3]])
        p1 = np.array([[9, 1, 2, 3]])  # differs only on the masked-out class 0
        m.add([p1, target], target, considered_classes=[1, 2, 3])
        v = m.value()
        assert np.isclose(v[0], 1.0) and np.isclose(v[1], 1.0)

    def test_kappa2annotator(self):
        m = Kappa2Annotator()
        gt = np.array([1, 1, 2, 2])
        m.add(np.array([1, 1, 2, 2]), np.array([1, 1, 2, 2]), gt)
        assert np.isclose(m.value(), 1.0)


class TestAggregation:
    def test_csv_roundtrip(self, tmp_path):
        m1, m2 = AggregatedMeter(), AggregatedMeter()
        for e in range(3):
            m1.add({"loss": 1.0 / (e + 1)})
            m2.add({"dice": 0.5 + 0.1 * e})
        lam = ListAggregatedMeter(["tra", "val"], [m1, m2])
        df = lam.summary()
        assert list(df.columns) == ["tra_loss", "val_dice"]
        out = tmp_path / "metrics.csv"
        lam.to_csv(out)
        assert out.exists()
        sd = lam.state_dict()
        m3 = AggregatedMeter()
        m3.load_state_dict(sd["tra"])
        assert m3.record == m1.record
